"""Repo maintenance tools (reference git-update-all / git-source-pickup.pl
equivalents): commit-everything semantics and the dated tarball naming."""

import os
import re
import subprocess
import tarfile

import pytest

from cvsim_tpu.utils import repo_maint


def _make_repo(tmp_path, name="proj"):
    repo = tmp_path / name
    repo.mkdir()
    env_args = ["-c", "user.email=t@example.com", "-c", "user.name=t"]
    subprocess.run(["git", "-C", str(repo), "init", "-b", "main"],
                   check=True, capture_output=True)
    (repo / "hello.txt").write_text("hi\n")
    subprocess.run(["git", "-C", str(repo), *env_args, "add", "-A"],
                   check=True, capture_output=True)
    subprocess.run(["git", "-C", str(repo), *env_args, "commit", "-m", "c0"],
                   check=True, capture_output=True)
    # commits from update_all need an identity too
    (repo / ".git" / "config").open("a").write(
        "[user]\n\temail = t@example.com\n\tname = t\n")
    return repo


def test_update_all_commits_everything(tmp_path):
    repo = _make_repo(tmp_path)
    (repo / "new.txt").write_text("new\n")
    (repo / "hello.txt").write_text("changed\n")
    branch = repo_maint.update_all(str(repo), push=False)
    assert branch == "main"
    st = subprocess.run(["git", "-C", str(repo), "status", "--porcelain"],
                        capture_output=True, text=True).stdout.strip()
    assert st == ""   # tree fully committed
    # idempotent on a clean tree (the reference shrugs off the no-op commit)
    assert repo_maint.update_all(str(repo), push=False) == "main"


def test_source_pickup_naming_and_dedup(tmp_path):
    if not any(os.access(os.path.join(p, "xz"), os.X_OK)
               for p in os.environ.get("PATH", "").split(os.pathsep) if p):
        pytest.skip("xz not available")
    repo = _make_repo(tmp_path, name="cvsproj")
    out = repo_maint.source_pickup(str(repo))
    assert out is not None and os.path.exists(out)
    base = os.path.basename(out)
    # {name}-{YYYYMMDD}-{HHMMSS}-commit-{hash}-src-branch-{b}.tar.xz
    # (git-source-pickup.pl:60)
    assert re.fullmatch(
        r"cvsproj-\d{8}-\d{6}-commit-[0-9a-f]{40}-src-branch-main\.tar\.xz",
        base), base
    # the project dir (with .git) is inside, rooted at the project name
    subprocess.run(["xz", "-dk", out], check=True)
    with tarfile.open(out[:-3]) as tf:
        names = tf.getnames()
    assert "cvsproj/hello.txt" in names
    assert any(n.startswith("cvsproj/.git") for n in names)
    # same commit -> same name -> skipped (reference: -f "$filename.xz")
    assert repo_maint.source_pickup(str(repo)) is None


def test_source_pickup_as_name_and_outdir(tmp_path):
    repo = _make_repo(tmp_path)
    dest = tmp_path / "dest"
    dest.mkdir()
    out = repo_maint.source_pickup(str(repo), as_name="rel",
                                   out_dir=str(dest))
    assert out is not None
    assert os.path.dirname(out) == str(dest)
    assert os.path.basename(out).startswith("rel-")


def test_cli_dispatch(tmp_path, capsys):
    from cvsim_tpu.cli import main as climain

    repo = _make_repo(tmp_path)
    (repo / "x.txt").write_text("x\n")
    rc = climain.main(["repo-update-all", "-no-push", "-C", str(repo),
                       "-m", "via cli"])
    assert rc == 0
    log = subprocess.run(["git", "-C", str(repo), "log", "-1",
                          "--format=%s"], capture_output=True,
                         text=True).stdout.strip()
    assert log == "via cli"
    rc = climain.main(["repo-source-pickup", "-C", str(repo),
                       "-o", str(tmp_path)])
    assert rc == 0
    assert "packed: " in capsys.readouterr().out

"""Daemon mode: `cvsim serve` + `cvsim -via <sock>` round-trip."""

import json
import os
import threading

import numpy as np

from cvsim_tpu.cli import serve
from cvsim_tpu.cli.main import main
from tests.test_cli import make_clip, read_all


def test_serve_roundtrip(tmp_path):
    sock = str(tmp_path / "cvsim.sock")
    src = make_clip(str(tmp_path / "in.y4m"))
    out_direct = str(tmp_path / "direct.y4m")
    out_served = str(tmp_path / "served.y4m")

    t = threading.Thread(
        target=serve.run_serve,
        args=(["-socket", sock, "-one-shot"],), daemon=True)
    t.start()
    for _ in range(200):
        if os.path.exists(sock):
            break
        threading.Event().wait(0.05)
    assert os.path.exists(sock)

    argv = ["posterize", "-i", src, "-o", out_served, "-width", "64",
            "-threshhold", "2"]
    rc = main(["-via", sock] + argv)
    assert rc == 0
    t.join(timeout=30)

    rc = main(["posterize", "-i", src, "-o", out_direct, "-width", "64",
               "-threshhold", "2"])
    assert rc == 0

    _, served = read_all(out_served)
    _, direct = read_all(out_direct)
    assert len(served) == len(direct) > 0
    for (sy, su, sv), (dy, du, dv) in zip(served, direct):
        np.testing.assert_array_equal(sy, dy)
        np.testing.assert_array_equal(su, du)
        np.testing.assert_array_equal(sv, dv)


def test_via_thin_client_no_site(tmp_path):
    """The -via client dispatches in __main__.py before any heavy import,
    so `python -S -m cvsim_tpu -via ...` (no site init at all) must work.
    This is the documented client invocation on hosts whose sitecustomize
    front-loads jax into every interpreter."""
    import subprocess
    import sys

    sock = str(tmp_path / "cvsim.sock")
    src = make_clip(str(tmp_path / "in.y4m"))
    out = str(tmp_path / "out.y4m")
    t = threading.Thread(
        target=serve.run_serve,
        args=(["-socket", sock, "-one-shot"],), daemon=True)
    t.start()
    for _ in range(200):
        if os.path.exists(sock):
            break
        threading.Event().wait(0.05)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "-S", "-m", "cvsim_tpu", "-via", sock,
         "posterize", "-i", src, "-o", out, "-width", "64"],
        cwd=repo, capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    t.join(timeout=30)
    _, frames = read_all(out)
    assert len(frames) > 0


def test_via_connect_error_is_friendly(tmp_path, capsys):
    rc = main(["-via", str(tmp_path / "nope.sock"), "posterize"])
    assert rc == 1
    assert "cannot reach server" in capsys.readouterr().err


def test_via_reports_unknown_command(tmp_path):
    sock = str(tmp_path / "cvsim.sock")
    t = threading.Thread(
        target=serve.run_serve,
        args=(["-socket", sock, "-one-shot"],), daemon=True)
    t.start()
    for _ in range(200):
        if os.path.exists(sock):
            break
        threading.Event().wait(0.05)
    rc = main(["-via", sock, "definitely-not-a-command"])
    assert rc == 1
    t.join(timeout=30)


def test_serve_devices_flag(tmp_path):
    """-devices through the daemon: the served engine run shards over the
    8-device CPU mesh and matches the direct single-device run byte-wise
    (the program-cache key carries the mesh, so a daemon serving both
    flavors must not cross the compiled programs)."""
    sock = str(tmp_path / "cvsim.sock")
    src = make_clip(str(tmp_path / "in.y4m"))
    out_direct = str(tmp_path / "direct.y4m")
    out_served = str(tmp_path / "served.y4m")

    t = threading.Thread(
        target=serve.run_serve,
        args=(["-socket", sock, "-one-shot"],), daemon=True)
    t.start()
    for _ in range(200):
        if os.path.exists(sock):
            break
        threading.Event().wait(0.05)
    assert os.path.exists(sock)

    argv = ["ntsc", "-i", src, "-width", "128", "-seed", "3"]
    rc = main(["-via", sock] + argv + ["-o", out_served, "-devices", "8"])
    assert rc == 0
    t.join(timeout=60)

    rc = main(argv + ["-o", out_direct])
    assert rc == 0
    with open(out_served, "rb") as fa, open(out_direct, "rb") as fb:
        assert fa.read() == fb.read()

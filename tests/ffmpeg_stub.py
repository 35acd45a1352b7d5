"""Stand-in `ffmpeg` executable for testing the pipe backend without a real
binary (none exists in this image). Speaks exactly the invocation shapes
cvsim_tpu.host.ffmpeg_pipe emits and a trivial "container" format:

    magic b"CVSIMFAKE\\n", then sections of
    [4-byte tag][8-byte big-endian length][payload]
    tags: b"vid0" = raw Y4M bytes, b"aud0" = raw WAV bytes,
          b"arg0" = the ffmpeg argv (space-joined utf-8), for assertions.

Supported invocations:
  decode video : -i PATH -f yuv4mpegpipe -pix_fmt yuv420p -
  decode audio : -i PATH -f s16le -ac N -ar R -
  encode (+mux): -f yuv4mpegpipe -i - [-i WAV -c:a pcm_s16le -shortest]
                 -c:v libx264 ... OUT
"""

import struct
import sys

MAGIC = b"CVSIMFAKE\n"


def read_container(path):
    with open(path, "rb") as f:
        blob = f.read()
    if not blob.startswith(MAGIC):
        return None
    sections = {}
    pos = len(MAGIC)
    while pos < len(blob):
        tag = blob[pos:pos + 4]
        (n,) = struct.unpack(">Q", blob[pos + 4:pos + 12])
        sections[tag] = blob[pos + 12:pos + 12 + n]
        pos += 12 + n
    return sections


def write_container(path, sections):
    with open(path, "wb") as f:
        f.write(MAGIC)
        for tag, payload in sections:
            f.write(tag + struct.pack(">Q", len(payload)) + payload)


def main(argv):
    args = argv[1:]
    inputs = [args[i + 1] for i, a in enumerate(args) if a == "-i"]
    out = args[-1]

    if "-f" in args and args[args.index("-f") + 1] == "yuv4mpegpipe" \
            and out == "-":
        # decode video to y4m pipe
        src = inputs[0]
        sections = read_container(src)
        if sections is None:       # plain y4m "container"
            with open(src, "rb") as f:
                payload = f.read()
        else:
            payload = sections[b"vid0"]
        sys.stdout.buffer.write(payload)
        return 0

    if "s16le" in args and out == "-":
        # decode audio to raw s16le pipe
        src = inputs[0]
        sections = read_container(src)
        wav = sections[b"aud0"] if sections else open(src, "rb").read()
        # minimal RIFF parse: find the data chunk
        pos = 12
        while pos < len(wav):
            tag = wav[pos:pos + 4]
            (n,) = struct.unpack("<I", wav[pos + 4:pos + 8])
            if tag == b"data":
                sys.stdout.buffer.write(wav[pos + 8:pos + 8 + n])
                return 0
            pos += 8 + n + (n & 1)
        sys.stderr.write("no data chunk\n")
        return 1

    if inputs and inputs[0] == "-":
        # encode stdin y4m (+ optional wav mux) into a fake container
        vid = sys.stdin.buffer.read()
        sections = [(b"vid0", vid)]
        if len(inputs) > 1:
            with open(inputs[1], "rb") as f:
                sections.append((b"aud0", f.read()))
        sections.append((b"arg0", " ".join(args).encode()))
        write_container(out, sections)
        return 0

    sys.stderr.write(f"ffmpeg_stub: unsupported argv {args}\n")
    return 2


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))

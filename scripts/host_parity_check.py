#!/usr/bin/env python3
"""Fresh-image byte parity: C launcher vs the reference binary.

The golden suite pins parity on a fixed corpus; this script re-proves
it on images the build has NEVER seen (a fresh RNG seed every run,
recorded in the artifact for reproduction) across the judge's config
classes: quarter / half / quarter+color8 / iTerm2 / kitty / auto-crop
per image, plus a 2x2 grid with titles.  Kitty image ids are
time-seeded on both sides (ref kitty-canvas.cc:48-53), so both streams
are normalized with the same i=<id> rewrite before comparison.

Writes PARITY_r05_host.json (or --out) and exits nonzero on any
mismatch.
"""

import json
import os
import re
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = os.path.join(REPO, ".refbuild", "src", "timg")
NATIVE = os.path.join(REPO, "timg-tpu-fast")

BASE = ["--debug-no-frame-delay"]
ENV = {k: v for k, v in os.environ.items() if not k.startswith("TIMG_")}
ENV["TERM"] = "xterm-256color"


def fresh_media(tdir, seed):
    import numpy as np
    from PIL import Image

    rng = np.random.default_rng(seed)
    files = {}

    def save(name, arr, mode):
        p = os.path.join(tdir, name)
        Image.fromarray(arr, mode).save(p)
        files[name] = p

    # photo-ish: gradient + noise patch, odd dimensions included
    for name, (h, w) in (("photo_641x399.png", (399, 641)),
                         ("photo_123x77.png", (77, 123)),
                         ("noise_257x191.png", (191, 257))):
        im = np.empty((h, w, 3), np.uint8)
        im[..., 0] = np.linspace(0, 255, w, dtype=np.uint8)[None]
        im[..., 1] = np.linspace(255, 0, h, dtype=np.uint8)[:, None]
        im[..., 2] = rng.integers(0, 256)
        ph, pw = h // 3, w // 3
        im[ph:2 * ph, pw:2 * pw] = rng.integers(
            0, 256, (ph, pw, 3), dtype=np.uint8)
        save(name, im, "RGB")

    # alpha content (exercises compose + RGBA decode path)
    h, w = 133, 201
    im = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
    im[..., 3] = np.linspace(0, 255, w, dtype=np.uint8)[None]
    save("alpha_201x133.png", im, "RGBA")

    # bordered image for --auto-crop
    h, w = 240, 320
    im = np.zeros((h, w, 3), np.uint8)
    im[40:-40, 56:-56] = rng.integers(0, 256, (h - 80, w - 112, 3),
                                      dtype=np.uint8)
    save("bordered_320x240.png", im, "RGB")
    return files


_ID = re.compile(rb"i=\d+")


def read_norm(path):
    with open(path, "rb") as f:
        return _ID.sub(b"i=ID", f.read())


def run_one(binary, args, files, tdir, tag):
    out = os.path.join(tdir, "out_" + tag)
    r = subprocess.run([binary, *args, "-o", out, *files], env=ENV,
                       capture_output=True, timeout=120)
    if r.returncode != 0:
        return None, "rc=%d %s" % (r.returncode, r.stderr[-120:])
    return read_norm(out), None


def main():
    out_path = sys.argv[sys.argv.index("--out") + 1] \
        if "--out" in sys.argv else os.path.join(REPO,
                                                 "PARITY_r05_host.json")
    if not (os.path.exists(REF) and os.path.exists(NATIVE)):
        print("missing reference or native binary", file=sys.stderr)
        return 2
    seed = int.from_bytes(os.urandom(4), "little")
    tdir = tempfile.mkdtemp(prefix="timg_parity_")
    files = fresh_media(tdir, seed)

    cases = []
    for img in files.values():
        # NOTE on --auto-crop: the minimal reference build (QOI+STB
        # only) does not implement it -- timg-print-version.cc:92
        # prints "(no --auto-crop)" and the flag is ignored -- so
        # vs-reference comparison is only valid where the crop is an
        # identity (borderless images).  The bordered image gets a
        # semantic check below instead.
        for modeargs in (["-pq"], ["-ph"], ["-pq", "--color8"],
                         ["-pi"], ["-pk"]):
            cases.append((["-g40x20", "-b", "black", *modeargs], [img]))
        if "bordered" not in img:
            cases.append((["-g40x20", "-b", "black", "-pq",
                           "--auto-crop"], [img]))
    # grid + title across all photos
    cases.append((["-g80x24", "-b", "black", "-ph", "--grid=2x2",
                   "--title"], list(files.values())[:4]))

    results, n_ok = [], 0
    for i, (args, imgs) in enumerate(cases):
        label = " ".join(args) + " " + " ".join(
            os.path.basename(p) for p in imgs)
        ours, e1 = run_one(NATIVE, BASE + args, imgs, tdir, "n%d" % i)
        ref, e2 = run_one(REF, BASE + args, imgs, tdir, "r%d" % i)
        if ours is None or ref is None:
            results.append({"case": label, "ok": False,
                            "error": e1 or e2})
        elif ours == ref:
            n_ok += 1
            results.append({"case": label, "ok": True,
                            "bytes": len(ours)})
        else:
            results.append({"case": label, "ok": False,
                            "error": "byte mismatch (%d vs %d bytes)"
                                     % (len(ours), len(ref))})
        print("[parity] %s %s" % ("ok " if results[-1]["ok"] else
                                  "FAIL", label), file=sys.stderr)

    # Semantic auto-crop invariant (reference can't compare: see NOTE
    # above): rendering the bordered image with --auto-crop must be
    # byte-identical to rendering the manually pre-cropped content.
    import numpy as np
    from PIL import Image

    bordered = files["bordered_320x240.png"]
    arr = np.asarray(Image.open(bordered).convert("RGB"))
    ys, xs = np.nonzero(arr.any(axis=2))
    pre = os.path.join(tdir, "precropped.png")
    Image.fromarray(arr[ys.min():ys.max() + 1,
                        xs.min():xs.max() + 1]).save(pre)
    a, e1 = run_one(NATIVE, BASE + ["-g40x20", "-b", "black", "-pq",
                                    "--auto-crop"], [bordered], tdir, "ac")
    b, e2 = run_one(NATIVE, BASE + ["-g40x20", "-b", "black", "-pq"],
                    [pre], tdir, "acp")
    cases.append((["semantic --auto-crop == pre-cropped"], [bordered]))
    if a is not None and a == b:
        n_ok += 1
        results.append({"case": "semantic: -pq --auto-crop bordered == "
                                "-pq precropped", "ok": True,
                        "bytes": len(a)})
    else:
        results.append({"case": "semantic: -pq --auto-crop bordered == "
                                "-pq precropped", "ok": False,
                        "error": e1 or e2 or "byte mismatch"})
    print("[parity] %s %s" % ("ok " if results[-1]["ok"] else "FAIL",
                              results[-1]["case"]), file=sys.stderr)

    ok = n_ok == len(cases)
    artifact = {
        "round": 5,
        "script": "scripts/host_parity_check.py",
        "seed": seed,
        "result": "PARITY OK" if ok else "MISMATCH",
        "cases_ok": n_ok,
        "cases_total": len(cases),
        "cases": results,
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
        f.write("\n")
    print(("PARITY OK" if ok else "MISMATCH") +
          " %d/%d (seed %d)" % (n_ok, len(cases), seed))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

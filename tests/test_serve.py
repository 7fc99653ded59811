"""Resident session mode (timg-tpu --serve, VERDICT r3 #6).

Byte-parity contract: a request served by the warm resident process
must produce the same stream as a cold one-shot run.  The server runs
in a thread here (requests execute off the main thread; the
socket-side interrupt watcher replaces signal arming, cli._arm_signals).
"""

import os
import threading
import time

import numpy as np
import pytest

from timg_tpu import serve as serve_mod


@pytest.fixture()
def server(tmp_path):
    sock = str(tmp_path / "srv.sock")
    ready = threading.Event()
    state = {"rc": None}

    def run():
        state["rc"] = serve_mod.serve(sock, ready_callback=ready.set,
                                      max_requests=16)

    t = threading.Thread(target=run, daemon=True)
    t.start()
    assert ready.wait(timeout=60), "server did not come up"
    yield sock
    # unblock the accept loop so the thread exits
    try:
        import socket as s
        c = s.socket(s.AF_UNIX, s.SOCK_STREAM)
        c.connect(sock)
        c.close()
    except OSError:
        pass


def _png(tmp_path, name="x.png", seed=1):
    from PIL import Image

    rng = np.random.default_rng(seed)
    p = tmp_path / name
    Image.fromarray(rng.integers(0, 256, (40, 60, 3), dtype=np.uint8),
                    "RGB").save(p)
    return str(p)


BASE = ["-pq", "-g40x12", "--debug-no-frame-delay", "-b", "black"]


def test_served_matches_cold(server, tmp_path):
    from tests.test_golden import run_ours

    png = _png(tmp_path)
    cold = run_ours(BASE, [png])
    out = tmp_path / "served.out"
    rc = serve_mod.request(BASE + ["-o", str(out), png],
                           socket_path=server)
    assert rc == 0
    assert out.read_bytes() == cold


def test_sequential_requests_stay_correct(server, tmp_path):
    from tests.test_golden import run_ours

    for i in range(3):
        png = _png(tmp_path, f"s{i}.png", seed=10 + i)
        cold = run_ours(BASE, [png])
        out = tmp_path / f"o{i}.out"
        rc = serve_mod.request(BASE + ["-o", str(out), png],
                               socket_path=server)
        assert rc == 0
        assert out.read_bytes() == cold, f"request {i} diverged"


def test_exit_code_propagates(server, tmp_path):
    rc = serve_mod.request(BASE + ["-o", os.devnull,
                                   str(tmp_path / "missing.png")],
                           socket_path=server)
    assert rc == 1  # image read error


def test_relative_path_resolves_against_client_cwd(server, tmp_path):
    from tests.test_golden import run_ours

    png = _png(tmp_path, "rel.png", seed=3)
    cold = run_ours(BASE, [png])
    out = tmp_path / "rel.out"
    prev = os.getcwd()
    os.chdir(tmp_path)
    try:
        rc = serve_mod.request(BASE + ["-o", str(out), "rel.png"],
                               socket_path=server)
    finally:
        os.chdir(prev)
    assert rc == 0
    assert out.read_bytes() == cold


def test_poison_env_is_delegated(server, tmp_path, monkeypatch):
    png = _png(tmp_path, "poison.png", seed=4)
    monkeypatch.setenv("TIMG_TPU_FORCE_NUMPY", "1")
    rc = serve_mod.request(BASE + ["-o", os.devnull, png],
                           socket_path=server)
    assert rc is None  # delegate: caller must run the one-shot path


def test_nested_serve_is_delegated(server):
    assert serve_mod.request(["--serve"], socket_path=server) is None


def test_absent_server_returns_none(tmp_path):
    rc = serve_mod.request(["-pq", "x.png"],
                           socket_path=str(tmp_path / "nope.sock"))
    assert rc is None


def test_env_isolation(server, tmp_path, monkeypatch):
    """A request's env must not leak into the server process: the
    server-side TIMG_* state after a request with custom env is
    unchanged (validated indirectly: a second clean request still
    byte-matches the cold run)."""
    from tests.test_golden import run_ours

    png = _png(tmp_path, "envy.png", seed=5)
    cold = run_ours(BASE, [png])
    monkeypatch.setenv("TIMG_USE_UPPER_BLOCK", "1")  # changes bytes
    out1 = tmp_path / "e1.out"
    assert serve_mod.request(BASE + ["-o", str(out1), png],
                             socket_path=server) == 0
    monkeypatch.delenv("TIMG_USE_UPPER_BLOCK")
    out2 = tmp_path / "e2.out"
    assert serve_mod.request(BASE + ["-o", str(out2), png],
                             socket_path=server) == 0
    assert out1.read_bytes() != out2.read_bytes()
    assert out2.read_bytes() == cold


# ---------------------------------------------------------------------------
# C launcher integration: ./timg-tpu-fast delegates to the resident
# server for anything outside its native envelope.
# ---------------------------------------------------------------------------

def _launcher():
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "timg-tpu-fast")
    if not os.path.exists(path):
        pytest.skip("C launcher not built")
    return path


@pytest.fixture()
def server_proc(tmp_path):
    import subprocess
    import sys as _sys

    sock = str(tmp_path / "cs.sock")
    env = {k: v for k, v in os.environ.items()
           if not k.startswith("TIMG_")}
    env["TIMG_TPU_SERVE_SOCKET"] = sock
    proc = subprocess.Popen(
        [_sys.executable, "-m", "timg_tpu.cli", "--serve"],
        env=env, cwd="/root/repo",
        stdout=subprocess.PIPE, stderr=subprocess.PIPE)
    deadline = time.time() + 60
    while not os.path.exists(sock):
        if proc.poll() is not None or time.time() > deadline:
            proc.kill()
            pytest.fail("serve process did not come up: "
                        + proc.stderr.read().decode()[-400:])
        time.sleep(0.05)
    yield sock
    proc.terminate()
    try:
        proc.wait(timeout=10)
    except Exception:
        proc.kill()


def _y4m(tmp_path):
    p = tmp_path / "v.y4m"
    w, h = 64, 48
    rng = np.random.default_rng(6)
    with open(p, "wb") as f:
        f.write(("YUV4MPEG2 W%d H%d F25:1 Ip A1:1 C420jpeg\n"
                 % (w, h)).encode())
        for _ in range(3):
            f.write(b"FRAME\n")
            f.write(rng.integers(16, 236, (h, w), np.uint8).tobytes())
            f.write(np.full((h // 2, w // 2), 120, np.uint8).tobytes())
            f.write(np.full((h // 2, w // 2), 130, np.uint8).tobytes())
    return str(p)


def test_launcher_delegates_video_to_server(server_proc, tmp_path):
    import subprocess

    y4m = _y4m(tmp_path)
    args = ["-pq", "-g40x12", "--debug-no-frame-delay", "-b", "black",
            "--loops=1"]
    env = {k: v for k, v in os.environ.items()
           if not k.startswith("TIMG_")}
    env["TIMG_TPU_SERVE_SOCKET"] = server_proc
    out_srv = tmp_path / "srv.out"
    r = subprocess.run([_launcher()] + args + ["-o", str(out_srv), y4m],
                       env=env, capture_output=True, timeout=300)
    assert r.returncode == 0, r.stderr.decode()[-400:]
    # cold reference: same run with serving disabled
    env["TIMG_TPU_NO_SERVE"] = "1"
    out_cold = tmp_path / "cold.out"
    r2 = subprocess.run([_launcher()] + args + ["-o", str(out_cold), y4m],
                        env=env, capture_output=True, timeout=300)
    assert r2.returncode == 0
    assert out_srv.read_bytes() == out_cold.read_bytes()


def test_launcher_falls_back_when_server_absent(tmp_path):
    import subprocess

    y4m = _y4m(tmp_path)
    env = {k: v for k, v in os.environ.items()
           if not k.startswith("TIMG_")}
    env["TIMG_TPU_SERVE_SOCKET"] = str(tmp_path / "absent.sock")
    out = tmp_path / "fb.out"
    r = subprocess.run(
        [_launcher(), "-pq", "-g40x12", "--debug-no-frame-delay", "-b",
         "black", "--loops=1", "-o", str(out), y4m],
        env=env, capture_output=True, timeout=300)
    assert r.returncode == 0, r.stderr.decode()[-400:]
    assert out.read_bytes()


# --- hardening (VERDICT r4 #7): wedged clients, stale sockets, ------------
# --- interleaved clients ----------------------------------------------------

def _raw_request(sock_path, argv, fds, timeout=30.0):
    """Protocol client with explicit stdio fds (serve.request uses the
    process's own)."""
    import array
    import json
    import socket as s

    conn = s.socket(s.AF_UNIX, s.SOCK_STREAM)
    try:
        conn.settimeout(timeout)
        conn.connect(sock_path)
        conn.sendmsg([b"F"], [(s.SOL_SOCKET, s.SCM_RIGHTS,
                               array.array("i", fds))])
        req = {"argv": argv, "cwd": os.getcwd(), "env": dict(os.environ)}
        conn.sendall(json.dumps(req).encode() + b"\n")
        buf = bytearray()
        while len(buf) < 64:
            ch = conn.recv(1)
            if not ch or ch == b"\n":
                break
            buf += ch
        if buf.startswith(b"R "):
            return int(buf[2:])
        return None
    except OSError:
        return None
    finally:
        conn.close()


def test_wedged_client_does_not_starve_later_requests(tmp_path,
                                                      monkeypatch,
                                                      capfd):
    """A client whose tty is never drained is cut off by the
    per-request watchdog; the next client is served normally.

    capfd is disabled around the wedged request: the served CLI
    resolves its output fd via sys.stdout.fileno(), which must be the
    real fd 1 (as in production) for the guard's dup2 routing — not
    pytest's capture file."""
    import pty

    monkeypatch.setenv("TIMG_TPU_SERVE_REQUEST_TIMEOUT", "2")
    sock = str(tmp_path / "w.sock")
    ready = threading.Event()
    state = {"rc": None}

    def run():
        state["rc"] = serve_mod.serve(sock, ready_callback=ready.set,
                                      max_requests=2)

    t = threading.Thread(target=run, daemon=True)
    t.start()
    assert ready.wait(timeout=60)

    # big sixel output into a pty nobody reads: fills the ~64 KB tty
    # buffer and wedges a blocking writer forever.  A large noise PNG
    # guarantees the stream far exceeds the buffer (sixel of noise is
    # ~several hundred KB).
    from PIL import Image

    rng = np.random.default_rng(9)
    big = tmp_path / "big.png"
    Image.fromarray(rng.integers(0, 256, (600, 800, 3), dtype=np.uint8),
                    "RGB").save(big)
    master, slave = pty.openpty()
    devnull = os.open(os.devnull, os.O_RDONLY)
    t0 = time.monotonic()
    with capfd.disabled():
        rc = _raw_request(sock, ["-ps", "-g300x100",
                                 "--debug-no-frame-delay", "-b", "black",
                                 str(big)], [devnull, slave, slave],
                          timeout=60)
    elapsed = time.monotonic() - t0
    os.close(devnull)
    os.close(slave)
    os.close(master)
    assert rc is not None, "watchdog never unwedged the request"
    # the request genuinely wedged (>= the 2 s watchdog budget) and was
    # then cut off promptly
    assert 1.5 <= elapsed < 30, f"unwedge took {elapsed:.1f}s"

    # the server must still serve the next request, bytes intact
    from tests.test_golden import run_ours

    png2 = _png(tmp_path, "after.png", seed=10)
    cold = run_ours(BASE, [png2])
    out = tmp_path / "after.out"
    rc2 = serve_mod.request(BASE + ["-o", str(out), png2],
                            socket_path=sock)
    assert rc2 == 0
    assert out.read_bytes() == cold
    t.join(timeout=30)
    assert state["rc"] == 0


def test_request_guard_restores_blocking_stdout(server, tmp_path):
    """The client's stdout description is blocking again after a
    served request (O_NONBLOCK is set only for the request)."""
    import fcntl

    png = _png(tmp_path, "fl.png", seed=3)
    r, w = os.pipe()
    devnull = os.open(os.devnull, os.O_RDONLY)
    rc = _raw_request(server, BASE + [png], [devnull, w, w])
    assert rc == 0
    flags = fcntl.fcntl(w, fcntl.F_GETFL)
    os.close(devnull)
    os.close(w)
    os.close(r)
    assert not (flags & os.O_NONBLOCK)


def test_stale_socket_client_falls_back_fast(tmp_path):
    """A socket file with no listener: the python client returns None
    immediately (callers run the one-shot path); the C launcher falls
    back and still renders."""
    import socket as s
    import subprocess

    stale = str(tmp_path / "stale.sock")
    srv = s.socket(s.AF_UNIX, s.SOCK_STREAM)
    srv.bind(stale)
    srv.close()  # file remains, nobody listens
    t0 = time.monotonic()
    assert serve_mod.request(["-h"], socket_path=stale) is None
    assert time.monotonic() - t0 < 5

    png = _png(tmp_path, "st.png", seed=4)
    env = {k: v for k, v in os.environ.items()
           if not k.startswith("TIMG_")}
    env["TIMG_TPU_SERVE_SOCKET"] = stale
    out = tmp_path / "st.out"
    r = subprocess.run(
        [_launcher(), "-pq", "-g40x12", "--debug-no-frame-delay", "-b",
         "black", "-o", str(out), png],
        env=env, capture_output=True, timeout=300)
    assert r.returncode == 0, r.stderr.decode()[-400:]
    assert out.read_bytes()


def test_two_interleaved_clients(server, tmp_path):
    """Two clients racing: both complete with correct bytes (requests
    serialize on the server; the backlog holds the second)."""
    from tests.test_golden import run_ours

    pngs = [_png(tmp_path, f"i{i}.png", seed=20 + i) for i in range(2)]
    colds = [run_ours(BASE, [p]) for p in pngs]
    outs = [tmp_path / f"i{i}.out" for i in range(2)]
    rcs = [None, None]

    def go(i):
        rcs[i] = serve_mod.request(BASE + ["-o", str(outs[i]), pngs[i]],
                                   socket_path=server)

    ts = [threading.Thread(target=go, args=(i,)) for i in range(2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=120)
    assert rcs == [0, 0]
    for i in range(2):
        assert outs[i].read_bytes() == colds[i], f"client {i} diverged"

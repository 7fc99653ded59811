"""Resident session mode: `timg-tpu --serve` (VERDICT r3 #6).

The reference is a one-shot CLI whose whole cost is milliseconds of CPU
(ref src/timg.cc:426 main); the TPU-native build's device path instead
pays seconds of process boot (python + jax + PJRT + compile-cache open)
per invocation, which `prefer_host` routes around — meaning the device
was never the *interactive* path.  Serve mode keeps ONE warm process
resident: a unix-socket server holding the imported jax session, the
persistent compile cache, and every warmed jit, so repeat invocations
cost a socket round-trip plus the actual work.

Protocol (one request per connection, requests served sequentially):

  client -> server   1 byte  b"F"  + SCM_RIGHTS [stdin, stdout, stderr]
  client -> server   one JSON line {"argv": [...], "cwd": "...",
                                    "env": {...}}
  client -> server   b"I\\n" at any time = forward SIGINT
  server -> client   b"R <exitcode>\\n"   on completion
  server -> client   b"D\\n"             = delegate (run it yourself)

Passing the client's real fds makes terminal queries, pagers and
escape-stream output behave exactly as a direct run: the served
process IS on the client's tty for the duration.  Requests that would
poison the resident session (TIMG_TPU_FORCE_NUMPY pins the process-wide
jax platform; a nested --serve) are answered with "delegate" and the
client falls back to the one-shot path.

The C launcher connects automatically when the socket exists (see
native/timg_fast_main.cc) for every invocation it would otherwise exec
the python CLI for; TIMG_TPU_SERVE_SOCKET overrides the path and
TIMG_TPU_NO_SERVE=1 disables client-side use.
"""

from __future__ import annotations

import array
import json
import os
import socket
import sys
import threading
from typing import List, Optional

_MAX_REQ = 1 << 20  # sanity bound on the JSON request line

# Requests that would mutate process-global jax state are unservable
# in the resident process: TIMG_TPU_FORCE_NUMPY pins the platform via
# config.update, and a JAX_PLATFORMS differing from the server's would
# silently run on the wrong backend.
def _env_poisoned(env: dict) -> bool:
    if env.get("TIMG_TPU_FORCE_NUMPY"):
        return True
    theirs = env.get("JAX_PLATFORMS", "")
    ours = os.environ.get("JAX_PLATFORMS", "")
    return theirs != ours


def default_socket_path() -> str:
    override = os.environ.get("TIMG_TPU_SERVE_SOCKET")
    if override:
        return override
    run_dir = os.environ.get("XDG_RUNTIME_DIR")
    if run_dir and os.path.isdir(run_dir):
        return os.path.join(run_dir, "timg-tpu.sock")
    return os.path.join("/tmp", f"timg-tpu-{os.getuid()}.sock")


def _recv_fds(conn: socket.socket, n_fds: int = 3):
    """Receive the b'F' hello + n_fds rights."""
    fds = array.array("i")
    msg, ancdata, _flags, _addr = conn.recvmsg(
        1, socket.CMSG_LEN(n_fds * fds.itemsize))
    if msg != b"F":
        return None
    for cmsg_level, cmsg_type, cmsg_data in ancdata:
        if (cmsg_level == socket.SOL_SOCKET
                and cmsg_type == socket.SCM_RIGHTS):
            fds.frombytes(
                cmsg_data[:len(cmsg_data) - len(cmsg_data) % fds.itemsize])
    if len(fds) != n_fds:
        for fd in fds:
            os.close(fd)
        return None
    return list(fds)


def _send_fds(conn: socket.socket, fds: List[int]) -> None:
    conn.sendmsg([b"F"], [(socket.SOL_SOCKET, socket.SCM_RIGHTS,
                           array.array("i", fds))])


def _read_line(conn: socket.socket, limit: int = _MAX_REQ) -> bytes:
    buf = bytearray()
    while len(buf) < limit:
        ch = conn.recv(1)
        if not ch:
            return bytes(buf)
        if ch == b"\n":
            return bytes(buf)
        buf += ch
    return bytes(buf)


def _servable(argv: List[str], env: dict) -> bool:
    if any(a == "--serve" or a.startswith("--serve=") for a in argv):
        return False
    return not _env_poisoned(env)


class _RequestGuard:
    """Swap process identity (fds 0-2, cwd, environ) to the client's
    for the duration of one request, restoring afterwards."""

    def __init__(self, fds: List[int], cwd: str, env: dict):
        self._fds = fds
        self._cwd = cwd
        self._env = env
        self._saved_fds: List[int] = []
        self._saved_cwd = ""
        self._saved_env: dict = {}
        self._saved_flags = None

    def __enter__(self):
        self._saved_fds = [os.dup(i) for i in range(3)]
        for i, fd in enumerate(self._fds):
            os.dup2(fd, i)
        # Non-blocking stdout for the request: a wedged client (tty
        # never drained) must not block the resident process forever —
        # the sequencer's write loop handles EAGAIN + the watchdog's
        # interrupt flag.  Flags live on the shared open file
        # description, so restore them on exit (the client still owns
        # the terminal afterwards).
        import fcntl
        try:
            self._saved_flags = fcntl.fcntl(1, fcntl.F_GETFL)
            fcntl.fcntl(1, fcntl.F_SETFL,
                        self._saved_flags | os.O_NONBLOCK)
        except OSError:
            self._saved_flags = None
        self._saved_cwd = os.getcwd()
        try:
            os.chdir(self._cwd)
        except OSError:
            pass
        self._saved_env = dict(os.environ)
        os.environ.clear()
        os.environ.update(self._env)
        return self

    def __exit__(self, *exc):
        try:
            sys.stdout.flush()
            sys.stderr.flush()
        except Exception:
            pass
        if self._saved_flags is not None:
            import fcntl
            try:
                fcntl.fcntl(1, fcntl.F_SETFL, self._saved_flags)
            except OSError:
                pass
        for i, fd in enumerate(self._saved_fds):
            os.dup2(fd, i)
            os.close(fd)
        for fd in self._fds:
            try:
                os.close(fd)
            except OSError:
                pass
        os.environ.clear()
        os.environ.update(self._saved_env)
        try:
            os.chdir(self._saved_cwd)
        except OSError:
            pass
        return False


def _watch_interrupt(conn: socket.socket, done: threading.Event) -> None:
    """Socket-side interrupt: b'I' lines (or client death) set the same
    flag the CLI's SIGINT handler sets (ref timg.cc:156-157 analog)."""
    from timg_tpu import cli

    try:
        conn.settimeout(0.25)
        while not done.is_set():
            try:
                data = conn.recv(1)
            except socket.timeout:
                continue
            except OSError:
                break
            if done.is_set():   # request already finished: ignore
                break
            if not data:        # client vanished: stop producing output
                cli.interrupt_received = True
                break
            if data == b"I":
                cli.interrupt_received = True
    finally:
        try:
            conn.settimeout(None)
        except OSError:
            pass


def _handle(conn: socket.socket) -> None:
    from timg_tpu import cli

    fds = _recv_fds(conn)
    if fds is None:
        return
    try:
        line = _read_line(conn)
        req = json.loads(line.decode("utf-8"))
        argv = [str(a) for a in req.get("argv", [])]
        cwd = str(req.get("cwd", "/"))
        env = {str(k): str(v) for k, v in req.get("env", {}).items()}
    except Exception:
        for fd in fds:
            os.close(fd)
        return
    if not _servable(argv, env):
        for fd in fds:
            os.close(fd)
        try:
            conn.sendall(b"D\n")
        except OSError:
            pass
        return
    done = threading.Event()
    watcher = threading.Thread(target=_watch_interrupt,
                               args=(conn, done), daemon=True)
    watcher.start()

    # Per-request watchdog (VERDICT r4 #7): a request that outlives the
    # budget gets the interrupt flag — combined with the non-blocking
    # client stdout this unwedges blocked writes, so one stuck client
    # cannot starve every later invocation.  cli.main resets the flag
    # at entry, so a watchdog firing at the done/next-request boundary
    # cannot poison the following request.
    try:
        budget = float(os.environ.get("TIMG_TPU_SERVE_REQUEST_TIMEOUT",
                                      "300"))
    except ValueError:
        budget = 300.0

    def _watchdog():
        if not done.wait(budget):
            cli.interrupt_received = True

    if budget > 0:
        threading.Thread(target=_watchdog, daemon=True).start()
    code = 1
    try:
        with _RequestGuard(fds, cwd, env):
            try:
                code = cli.main(argv)
            except SystemExit as e:
                code = int(e.code or 0)
            except BrokenPipeError:
                code = 1
            except Exception:
                import traceback
                traceback.print_exc(file=sys.stderr)
                code = 1
    finally:
        done.set()
        # Do NOT join the watcher: its poll slice would add up to
        # 0.25 s to every request.  It is a daemon thread that exits
        # on its next timeout tick (or when the connection closes) and
        # checks `done` before touching the interrupt flag, so it
        # cannot poison the next request.
    try:
        conn.sendall(b"R %d\n" % code)
    except OSError:
        pass


def serve(socket_path: Optional[str] = None,
          ready_callback=None, max_requests: Optional[int] = None) -> int:
    """Run the resident server (blocks).  ``max_requests`` bounds the
    loop for tests; ``ready_callback`` fires once listening."""
    path = socket_path or default_socket_path()
    # stale socket from a dead server: connect() failing means unused
    if os.path.exists(path):
        probe = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        try:
            probe.connect(path)
            probe.close()
            print(f"timg-tpu --serve: {path} already served",
                  file=sys.stderr)
            return 1
        except OSError:
            os.unlink(path)
        finally:
            probe.close()
    srv = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    try:
        srv.bind(path)
        os.chmod(path, 0o600)
        srv.listen(8)
        # Warm the session: import jax + open the compile cache now so
        # the first request doesn't pay it.
        try:
            from timg_tpu.cli import _setup_compile_cache
            _setup_compile_cache()
            import jax
            jax.devices()
        except Exception:
            pass
        if ready_callback is not None:
            ready_callback()
        served = 0
        while max_requests is None or served < max_requests:
            try:
                conn, _ = srv.accept()
            except OSError:
                break
            try:
                _handle(conn)
            finally:
                try:
                    conn.close()
                except OSError:
                    pass
            served += 1
        return 0
    finally:
        srv.close()
        try:
            os.unlink(path)
        except OSError:
            pass


def request(argv: List[str], socket_path: Optional[str] = None,
            timeout: float = 600.0) -> Optional[int]:
    """Python client: run ``argv`` on the resident server with OUR
    stdio.  Returns the exit code, or None when the server is absent
    or answered 'delegate' (caller runs the one-shot path)."""
    path = socket_path or default_socket_path()
    conn = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    try:
        conn.settimeout(5.0)
        conn.connect(path)
        _send_fds(conn, [0, 1, 2])
        req = {"argv": argv, "cwd": os.getcwd(),
               "env": dict(os.environ)}
        conn.sendall(json.dumps(req).encode("utf-8") + b"\n")
        conn.settimeout(timeout)
        line = _read_line(conn, 64)
        if line.startswith(b"R "):
            return int(line[2:])
        return None
    except OSError:
        return None
    finally:
        conn.close()

"""Full-session boot for the one-shot launcher's fallback exec.

The launcher (./timg-tpu) runs `python -S` so TPU-pod sitecustomize
(which preimports jax, ~2.5 s) stays off the interactive path.  When
an invocation falls outside the still fastpath (animations, videos,
exotic decoders), the old fallback re-exec'd WITH site and paid that
preimport even for host-only work -- a numpy-mirror GIF animation cost
~3 s of boot for ~0.3 s of rendering.

This boot keeps `-S` and instead:
  * adds the interpreter's site-packages via site.addsitedir (which
    also processes .pth files, unlike a bare sys.path.append);
  * installs a meta-path hook that imports `sitecustomize` (the
    PJRT-plugin registration shim TPU pods put on PYTHONPATH) right
    before the FIRST real `import jax` -- so device users still get
    their backend, and host-only runs never pay for it.

If anything about this slim boot fails, it re-execs with full site as
a last resort, preserving the old behavior.
"""

from __future__ import annotations

import importlib.abc
import os
import sys


class _JaxBootHook(importlib.abc.MetaPathFinder):
    """Run the deferred site customization before the first jax import.

    find_spec returns None always -- the hook never resolves modules, it
    only uses the first `jax` lookup as its trigger.  sitecustomize
    itself imports jax (axon.register); the `done` flag keeps that
    recursion on the normal import machinery.
    """

    done = False

    def find_spec(self, name, path, target=None):  # noqa: ARG002
        if name == "jax" and not _JaxBootHook.done:
            _JaxBootHook.done = True
            try:
                import sitecustomize  # noqa: F401
            except Exception:
                pass  # no pod shim: plain jax plugin discovery applies
        return None


def _add_site_packages() -> None:
    import site

    ver = "python%d.%d" % sys.version_info[:2]
    exe_prefix = os.path.dirname(
        os.path.dirname(os.path.abspath(sys.executable)))
    for prefix in (exe_prefix, sys.prefix, getattr(sys, "base_prefix", "")):
        if not prefix:
            continue
        cand = os.path.join(prefix, "lib", ver, "site-packages")
        if os.path.isdir(cand) and cand not in sys.path:
            site.addsitedir(cand)
    # Deps installed with `pip install --user` live in the user site
    # dir (~/.local/...), which a prefix walk never finds.
    try:
        user_site = site.getusersitepackages()
    except Exception:
        user_site = None
    if user_site and os.path.isdir(user_site) and user_site not in sys.path:
        site.addsitedir(user_site)


def _reexec_with_site(repo: str) -> None:
    boot = ("import sys; sys.path.insert(0, %r); "
            "from timg_tpu.cli import main; "
            "sys.exit(main(sys.argv[1:]))" % repo)
    os.execv(sys.executable,
             [sys.executable, "-c", boot] + sys.argv[1:])


def boot(repo: str) -> int:
    if not sys.flags.no_site:
        from timg_tpu.cli import main

        return main(sys.argv[1:])
    try:
        _add_site_packages()
        sys.meta_path.insert(0, _JaxBootHook())
        from timg_tpu.cli import main
    except Exception:
        _reexec_with_site(repo)
        return 2  # unreachable (execv), keeps type checkers happy
    try:
        return main(sys.argv[1:])
    except ImportError:
        # A dep cli imports lazily inside main() is missing under the
        # slim boot (full site may still find it, e.g. a layout the
        # site-dir walk above doesn't know).  Per-file decode errors
        # are caught and queued by cli itself, so an ImportError
        # escaping main() predates any stdout emission -- a clean
        # full-site re-exec cannot duplicate output.
        _reexec_with_site(repo)
        return 2  # unreachable (execv)

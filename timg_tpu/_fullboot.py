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


class _ExistingModuleLoader(importlib.abc.Loader):
    """Resolve an import to a module sitecustomize already created.

    When the deferred shim imports jax itself, the OUTER `import jax`
    that triggered the hook would otherwise re-execute jax/__init__.py
    from scratch (the import machinery never rechecks sys.modules for
    top-level names after find_spec starts) — paying the top-level
    init twice and replacing the module object the shim configured.
    Handing back the existing module keeps one canonical instance."""

    def __init__(self, module, orig_spec):
        self._module = module
        self._orig_spec = orig_spec

    def create_module(self, spec):  # noqa: ARG002
        return self._module

    def exec_module(self, module) -> None:
        # _init_module_attrs stamped our synthetic spec/loader over the
        # module before this call; restore the real ones.
        if self._orig_spec is not None:
            module.__spec__ = self._orig_spec
            if self._orig_spec.loader is not None:
                module.__loader__ = self._orig_spec.loader


class _JaxBootHook(importlib.abc.MetaPathFinder):
    """Run the deferred site customization before the first jax import.

    The hook only uses the first `jax` lookup as its trigger; the
    `done` flag keeps the shim's own recursive jax import on the
    normal machinery.  If the shim imported jax, the already-built
    module is handed back (see _ExistingModuleLoader); otherwise
    find_spec returns None and the normal import proceeds.
    """

    done = False

    def find_spec(self, name, path, target=None):  # noqa: ARG002
        if name == "jax" and not _JaxBootHook.done:
            _JaxBootHook.done = True
            try:
                import sitecustomize  # noqa: F401
            except Exception:
                pass  # no pod shim: plain jax plugin discovery applies
            # Pod shims force their accelerator via config.update
            # ("jax_platforms", "axon,cpu"), which silently overrides
            # the JAX_PLATFORMS=cpu pin cli._force_host_backend set
            # BEFORE this deferred import.  A FORCE_NUMPY "CPU
            # reference" run would then compute on the remote device —
            # and hang forever if the tunnel stalls mid-fetch.  Re-pin
            # after the shim: config.update wins over the shim's by
            # running later.  (Shim-less boots never enter this branch:
            # jax is only in sys.modules here if sitecustomize
            # imported it.)
            if "jax" in sys.modules:
                mod = sys.modules["jax"]
                if os.environ.get("TIMG_TPU_FORCE_NUMPY"):
                    try:
                        mod.config.update("jax_platforms", "cpu")
                    except Exception:
                        pass
                import importlib.util
                spec = importlib.util.spec_from_loader(
                    name, _ExistingModuleLoader(
                        mod, getattr(mod, "__spec__", None)))
                # _bootstrap._find_spec ignores a finder's spec when the
                # name is already in sys.modules and returns
                # module.__spec__ instead (re-executing the module with
                # its original file loader).  Stamping the synthetic
                # spec onto the module routes the load through
                # _ExistingModuleLoader; exec_module restores the real
                # spec.
                mod.__spec__ = spec
                return spec
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

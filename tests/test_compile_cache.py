"""utils/compile_cache.py — persistent-cache location contract.

Round-5 incident: a machine restart wiped /tmp and with it the primed
train-step compile pair, so the next bench would have paid the full remote
cold compile (~minutes). The default cache dir is therefore REPO-LOCAL
(.jax_cache_tpu/), which survives reboots; these tests pin that plus the
override precedence (explicit arg > ACLGAN_COMPILE_CACHE >
JAX_COMPILATION_CACHE_DIR > default) every CLI/tool relies on.
"""

import os

import jax

from aclgan_tpu.utils import compile_cache

_REPO_ROOT = os.path.abspath(
    os.path.join(os.path.dirname(__file__), ".."))


def _call(env=None, arg=None):
    """Run enable() under a controlled env, restoring jax config + env."""
    saved = {k: os.environ.pop(k, None)
             for k in ("ACLGAN_COMPILE_CACHE", "JAX_COMPILATION_CACHE_DIR")}
    old_dir = jax.config.jax_compilation_cache_dir
    try:
        for k, v in (env or {}).items():
            os.environ[k] = v
        return compile_cache.enable(arg)
    finally:
        jax.config.update("jax_compilation_cache_dir", old_dir)
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def test_default_is_repo_local_not_tmp():
    d = compile_cache.DEFAULT_DIR
    assert os.path.basename(d) == ".jax_cache_tpu"
    assert os.path.dirname(d) == _REPO_ROOT
    assert not d.startswith("/tmp")
    assert _call() == d
    assert jax.config.jax_compilation_cache_dir is not None


def test_env_and_arg_overrides():
    assert _call(env={"ACLGAN_COMPILE_CACHE": "/x/a"}) == "/x/a"
    assert _call(env={"JAX_COMPILATION_CACHE_DIR": "/x/b"}) == "/x/b"
    # ACLGAN_COMPILE_CACHE wins over the generic JAX var
    assert _call(env={"ACLGAN_COMPILE_CACHE": "/x/a",
                      "JAX_COMPILATION_CACHE_DIR": "/x/b"}) == "/x/a"
    # explicit argument beats everything
    assert _call(env={"ACLGAN_COMPILE_CACHE": "/x/a"}, arg="/x/c") == "/x/c"

"""Tests for utils/compile_opts.py (env-driven XLA compiler options)."""

import numpy as np
import pytest

from range_view_3d_detection_tpu.utils import compile_opts


def test_parse_options():
    assert compile_opts.parse_options("") == {}
    assert compile_opts.parse_options("a=1") == {"a": "1"}
    assert compile_opts.parse_options(" a=1, b = x=y ,") == {
        "a": "1",
        "b": "x=y",
    }
    with pytest.raises(ValueError):
        compile_opts.parse_options("notakv")


def test_jit_env_options_unset_is_plain_jit(monkeypatch):
    monkeypatch.delenv(compile_opts.ENV_VAR, raising=False)
    f = compile_opts.jit_env_options(lambda x: x * 2)
    out = np.asarray(f(np.ones((4,), np.float32)))
    np.testing.assert_allclose(out, 2.0)


def test_jit_env_options_with_option(monkeypatch):
    # xla_embed_ir_in_executable is a generic DebugOptions field the CPU
    # backend accepts; the point is the lower+compile(options) path runs
    # and memoizes per shape.
    monkeypatch.setenv(
        compile_opts.ENV_VAR, "xla_embed_ir_in_executable=False"
    )
    calls = []
    orig = compile_opts.jax.jit

    f = compile_opts.jit_env_options(lambda x: x + 1)
    a = np.zeros((3,), np.float32)
    np.testing.assert_allclose(np.asarray(f(a)), 1.0)
    np.testing.assert_allclose(np.asarray(f(a)), 1.0)  # memoized path
    b = np.zeros((5,), np.float32)  # new shape -> new compile
    np.testing.assert_allclose(np.asarray(f(b)), 1.0)
    assert orig is compile_opts.jax.jit and not calls  # no global state

"""LR schedule tests against the reference lr_update semantics
(optimization.py:227-297)."""

import math

import numpy as np
import pytest

from saragan_tpu.optim import lr_schedule, scale_lr


STEPS = 1000


def test_constant_without_schedule():
    assert lr_schedule(500, STEPS, 0.1, None, None, None, None) == 0.1


def test_linear_rise():
    # (step / rise_niter) * lr_max during the rise window
    assert lr_schedule(0, STEPS, 0.1, "linear", None, 200, None) == 0.0
    np.testing.assert_allclose(lr_schedule(100, STEPS, 0.1, "linear", None, 200, None), 0.05)
    # after the window: lr_max
    assert lr_schedule(200, STEPS, 0.1, "linear", None, 200, None) == 0.1
    assert lr_schedule(900, STEPS, 0.1, "linear", None, 200, None) == 0.1


def test_exponential_rise_endpoints():
    # starts at 1% of lr_max, reaches lr_max at rise_niter
    lr0 = lr_schedule(0, STEPS, 0.1, "exponential", None, 200, None)
    np.testing.assert_allclose(lr0, 0.001, rtol=1e-6)
    lr_end = lr_schedule(199, STEPS, 0.1, "exponential", None, 200, None)
    assert 0.09 < lr_end <= 0.1


def test_linear_decay():
    # (remaining / decay_niter) * lr_max inside the decay window
    assert lr_schedule(700, STEPS, 0.1, None, "linear", None, 200) == 0.1
    np.testing.assert_allclose(lr_schedule(900, STEPS, 0.1, None, "linear", None, 200), 0.05)
    np.testing.assert_allclose(lr_schedule(1000, STEPS, 0.1, None, "linear", None, 200), 0.0)


def test_exponential_decay_endpoints():
    # 1% of lr_max at the last step
    lr_last = lr_schedule(1000, STEPS, 0.1, None, "exponential", None, 200)
    np.testing.assert_allclose(lr_last, 0.001, rtol=1e-6)
    lr_start = lr_schedule(801, STEPS, 0.1, None, "exponential", None, 200)
    assert 0.09 < lr_start <= 0.1


def test_decay_wins_overlap():
    # both segments active and overlapping -> decay applies (the reference's
    # second tf.cond overwrites)
    lr = lr_schedule(900, STEPS, 0.1, "linear", "linear", 950, 200)
    np.testing.assert_allclose(lr, 0.05)


def test_unknown_kind_raises():
    with pytest.raises(ValueError):
        lr_schedule(0, STEPS, 0.1, "bogus", None, 10, None)


def test_scale_lr():
    g, d = scale_lr(1e-3, 2e-3, "sqrt", "linear", 4)
    np.testing.assert_allclose(g, 1e-3 * 2.0)
    np.testing.assert_allclose(d, 2e-3 * 4)
    g, d = scale_lr(1e-3, 2e-3, "none", "none", 4)
    assert (g, d) == (1e-3, 2e-3)
    # single worker: no scaling applied at all
    g, d = scale_lr(1e-3, 2e-3, "linear", "linear", 1)
    assert (g, d) == (1e-3, 2e-3)
    with pytest.raises(ValueError):
        scale_lr(1e-3, 1e-3, "bogus", "none", 4)

"""FID-Inception architecture validation.

The real weights can't be downloaded here, so the JAX implementation is
cross-validated against an *independent torch implementation of the same
specification*, driven by identical random parameters — this catches
transcription errors in padding, stride, BN, and pooling semantics.  When a
converted pt_inception npz is supplied (SARAGAN_INCEPTION_NPZ), the same
forward becomes bit-matched standard FID.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from saragan_tpu.metrics.inception import (  # noqa: E402
    InceptionPool3Features,
    inception_param_shapes,
    inception_pool3,
    preprocess,
    random_inception_params,
)


# ---------------------------------------------------------------------------
# independent torch reference of the same spec
# ---------------------------------------------------------------------------


def _t(p, k):
    return torch.from_numpy(p[k])


def t_bc(p, pre, x, stride=1, padding=0):
    x = F.conv2d(x, _t(p, f"{pre}.conv.weight"), stride=stride, padding=padding)
    x = F.batch_norm(
        x,
        _t(p, f"{pre}.bn.running_mean"),
        _t(p, f"{pre}.bn.running_var"),
        _t(p, f"{pre}.bn.weight"),
        _t(p, f"{pre}.bn.bias"),
        training=False,
        eps=1e-3,
    )
    return F.relu(x)


def t_avg(x):
    return F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=False)


def t_incep_a(p, pre, x):
    b1 = t_bc(p, f"{pre}.branch1x1", x)
    b5 = t_bc(p, f"{pre}.branch5x5_2", t_bc(p, f"{pre}.branch5x5_1", x), padding=2)
    b3 = t_bc(p, f"{pre}.branch3x3dbl_1", x)
    b3 = t_bc(p, f"{pre}.branch3x3dbl_2", b3, padding=1)
    b3 = t_bc(p, f"{pre}.branch3x3dbl_3", b3, padding=1)
    bp = t_bc(p, f"{pre}.branch_pool", t_avg(x))
    return torch.cat([b1, b5, b3, bp], 1)


def t_incep_b(p, pre, x):
    b3 = t_bc(p, f"{pre}.branch3x3", x, stride=2)
    bd = t_bc(p, f"{pre}.branch3x3dbl_1", x)
    bd = t_bc(p, f"{pre}.branch3x3dbl_2", bd, padding=1)
    bd = t_bc(p, f"{pre}.branch3x3dbl_3", bd, stride=2)
    return torch.cat([b3, bd, F.max_pool2d(x, 3, 2)], 1)


def t_incep_c(p, pre, x):
    b1 = t_bc(p, f"{pre}.branch1x1", x)
    b7 = t_bc(p, f"{pre}.branch7x7_1", x)
    b7 = t_bc(p, f"{pre}.branch7x7_2", b7, padding=(0, 3))
    b7 = t_bc(p, f"{pre}.branch7x7_3", b7, padding=(3, 0))
    bd = t_bc(p, f"{pre}.branch7x7dbl_1", x)
    bd = t_bc(p, f"{pre}.branch7x7dbl_2", bd, padding=(3, 0))
    bd = t_bc(p, f"{pre}.branch7x7dbl_3", bd, padding=(0, 3))
    bd = t_bc(p, f"{pre}.branch7x7dbl_4", bd, padding=(3, 0))
    bd = t_bc(p, f"{pre}.branch7x7dbl_5", bd, padding=(0, 3))
    bp = t_bc(p, f"{pre}.branch_pool", t_avg(x))
    return torch.cat([b1, b7, bd, bp], 1)


def t_incep_d(p, pre, x):
    b3 = t_bc(p, f"{pre}.branch3x3_2", t_bc(p, f"{pre}.branch3x3_1", x), stride=2)
    b7 = t_bc(p, f"{pre}.branch7x7x3_1", x)
    b7 = t_bc(p, f"{pre}.branch7x7x3_2", b7, padding=(0, 3))
    b7 = t_bc(p, f"{pre}.branch7x7x3_3", b7, padding=(3, 0))
    b7 = t_bc(p, f"{pre}.branch7x7x3_4", b7, stride=2)
    return torch.cat([b3, b7, F.max_pool2d(x, 3, 2)], 1)


def t_incep_e(p, pre, x, pool):
    b1 = t_bc(p, f"{pre}.branch1x1", x)
    b3 = t_bc(p, f"{pre}.branch3x3_1", x)
    b3 = torch.cat(
        [t_bc(p, f"{pre}.branch3x3_2a", b3, padding=(0, 1)),
         t_bc(p, f"{pre}.branch3x3_2b", b3, padding=(1, 0))], 1)
    bd = t_bc(p, f"{pre}.branch3x3dbl_1", x)
    bd = t_bc(p, f"{pre}.branch3x3dbl_2", bd, padding=1)
    bd = torch.cat(
        [t_bc(p, f"{pre}.branch3x3dbl_3a", bd, padding=(0, 1)),
         t_bc(p, f"{pre}.branch3x3dbl_3b", bd, padding=(1, 0))], 1)
    bp = t_avg(x) if pool == "avg" else F.max_pool2d(x, 3, stride=1, padding=1)
    bp = t_bc(p, f"{pre}.branch_pool", bp)
    return torch.cat([b1, b3, bd, bp], 1)


def torch_pool3(p, x):
    x = t_bc(p, "Conv2d_1a_3x3", x, stride=2)
    x = t_bc(p, "Conv2d_2a_3x3", x)
    x = t_bc(p, "Conv2d_2b_3x3", x, padding=1)
    x = F.max_pool2d(x, 3, 2)
    x = t_bc(p, "Conv2d_3b_1x1", x)
    x = t_bc(p, "Conv2d_4a_3x3", x)
    x = F.max_pool2d(x, 3, 2)
    x = t_incep_a(p, "Mixed_5b", x)
    x = t_incep_a(p, "Mixed_5c", x)
    x = t_incep_a(p, "Mixed_5d", x)
    x = t_incep_b(p, "Mixed_6a", x)
    for name in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
        x = t_incep_c(p, name, x)
    x = t_incep_d(p, "Mixed_7a", x)
    x = t_incep_e(p, "Mixed_7b", x, "avg")
    x = t_incep_e(p, "Mixed_7c", x, "max")
    return x.mean(dim=(2, 3))


# ---------------------------------------------------------------------------


def test_shape_table_is_inception_v3():
    shapes = inception_param_shapes()
    # 94 conv layers x 5 tensors
    assert len(shapes) == 94 * 5
    assert shapes["Mixed_7c.branch_pool.conv.weight"] == (192, 2048, 1, 1)


def test_jax_matches_independent_torch_implementation():
    params = random_inception_params(seed=3)
    x = np.random.default_rng(0).normal(0, 0.5, size=(2, 3, 299, 299)).astype(np.float32)
    got = np.asarray(inception_pool3(params, x), np.float32)
    want = torch_pool3(params, torch.from_numpy(x)).numpy()
    assert got.shape == want.shape == (2, 2048)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_preprocess_and_extractor():
    params = random_inception_params(seed=3)
    imgs = np.random.default_rng(1).integers(0, 255, size=(2, 64, 64, 3)).astype(np.float32)
    pre = np.asarray(preprocess(imgs))
    assert pre.shape == (2, 3, 299, 299)
    assert -1.01 <= pre.min() and pre.max() <= 1.01
    feats = InceptionPool3Features(params).extract(imgs)
    assert feats.shape == (2, 2048)
    assert np.all(np.isfinite(feats))


def test_pool3_golden_activations():
    """Recorded-activation regression (VERDICT r1 item 1c): pins the joint
    behavior of random_inception_params + preprocess + inception_pool3 so any
    drift in padding/stride/BN/pool semantics — even drift that torch_pool3
    above would mirror — fails loudly against constants recorded 2026-08-16."""
    p = random_inception_params(seed=7)
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 255, size=(2, 64, 64, 3)).astype(np.float32)
    feats = np.asarray(inception_pool3(p, preprocess(x)))
    golden_first4 = np.array(
        [[0.0, 0.11587839, 0.00166885, 0.01463999],
         [0.0, 0.11579387, 0.00163411, 0.01476035]], np.float32
    )
    np.testing.assert_allclose(feats[:, :4], golden_first4, rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(float(feats.mean()), 0.08659150, rtol=1e-3)
    np.testing.assert_allclose(float(feats.std()), 0.12712295, rtol=1e-3)

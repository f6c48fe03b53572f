"""Model-core tests: fused pairwise trick vs explicit dense oracle."""

import jax
import jax.numpy as jnp
import numpy as np

from libfm_tpu.data.batching import pad_rows
from libfm_tpu.models.fm import (
    FMConfig,
    FMParams,
    fm_batch_predict,
    init_fm,
    load_model_text,
    predict_dense,
    save_model_text,
)


def dense_oracle(w0, w, v, X):
    """Explicit O(n^2) FM: w0 + w.x + sum_{i<j} <v_i, v_j> x_i x_j."""
    n = X.shape[1]
    out = np.full(X.shape[0], w0, dtype=np.float64)
    out += X @ w
    vvt = v @ v.T  # [n, n]
    for b in range(X.shape[0]):
        for i in range(n):
            for j in range(i + 1, n):
                out[b] += vvt[i, j] * X[b, i] * X[b, j]
    return out


def _random_model(rng, n, k):
    w0 = rng.normal()
    w = rng.normal(size=n)
    v = rng.normal(size=(n, k)) * 0.3
    params = FMParams(
        w0=jnp.asarray(w0, jnp.float32),
        w=jnp.asarray(w, jnp.float32),
        v=jnp.asarray(v, jnp.float32),
    )
    return params, w0, w, v


def test_forward_matches_dense_oracle(rng, tiny_dataset):
    n, k = tiny_dataset.num_features, 3
    params, w0, w, v = _random_model(rng, n, k)
    cfg = FMConfig(num_features=n, num_factors=k)
    ids, vals = pad_rows(tiny_dataset)
    pred = fm_batch_predict(params, jnp.asarray(ids), jnp.asarray(vals), cfg)

    X = np.zeros((tiny_dataset.num_rows, n))
    for i in range(tiny_dataset.num_rows):
        for j in range(tiny_dataset.indptr[i], tiny_dataset.indptr[i + 1]):
            X[i, tiny_dataset.cols[j]] = tiny_dataset.vals[j]
    expected = dense_oracle(w0, w, v, X)
    np.testing.assert_allclose(np.asarray(pred), expected, rtol=2e-5)


def test_forward_with_real_values(rng):
    # non-unit feature values and repeated batches
    n, k, B, L = 11, 4, 5, 6
    params, w0, w, v = _random_model(rng, n, k)
    cfg = FMConfig(num_features=n, num_factors=k)
    ids = rng.integers(0, n, (B, L)).astype(np.int32)
    vals = rng.normal(size=(B, L)).astype(np.float32)
    # zero some entries to simulate padding
    vals[:, -2:] = 0.0
    pred = fm_batch_predict(params, jnp.asarray(ids), jnp.asarray(vals), cfg)

    # oracle via the same trick computed in numpy float64 per example —
    # note ids may repeat within a row; the pairwise-trick formula is the
    # ground truth definition here (matches reference predict,
    # fm_model.h:105-127)
    for b in range(B):
        s = np.zeros(k)
        s2 = 0.0
        lin = 0.0
        for l in range(L):
            d = v[ids[b, l]] * vals[b, l]
            s += d
            s2 += (d * d).sum()
            lin += w[ids[b, l]] * vals[b, l]
        expected = w0 + lin + 0.5 * ((s * s).sum() - s2)
        np.testing.assert_allclose(float(pred[b]), expected, rtol=3e-5)


def test_dense_predict_agrees(rng):
    n, k, B = 9, 4, 7
    params, w0, w, v = _random_model(rng, n, k)
    cfg = FMConfig(num_features=n, num_factors=k)
    X = (rng.uniform(size=(B, n)) < 0.4) * rng.normal(size=(B, n))
    pred_dense = predict_dense(params, jnp.asarray(X, jnp.float32), cfg)
    expected = dense_oracle(w0, w, v, X)
    np.testing.assert_allclose(np.asarray(pred_dense), expected, rtol=1e-4, atol=1e-4)


def test_bias_linear_switches(rng, tiny_dataset):
    n, k = tiny_dataset.num_features, 2
    params, w0, w, v = _random_model(rng, n, k)
    ids, vals = pad_rows(tiny_dataset)
    ids, vals = jnp.asarray(ids), jnp.asarray(vals)
    base = fm_batch_predict(
        params, ids, vals, FMConfig(n, k, use_bias=False, use_linear=False)
    )
    with_b = fm_batch_predict(
        params, ids, vals, FMConfig(n, k, use_bias=True, use_linear=False)
    )
    np.testing.assert_allclose(np.asarray(with_b - base), w0, rtol=1e-5)


def test_init_statistics():
    cfg = FMConfig(num_features=5000, num_factors=8, init_stdev=0.1)
    p = init_fm(cfg, jax.random.PRNGKey(0))
    assert float(jnp.abs(p.w).max()) == 0.0  # w starts at 0 for SGD
    assert abs(float(p.v.std()) - 0.1) < 0.01
    p2 = init_fm(cfg, jax.random.PRNGKey(0), mcmc_style_w=True)
    assert abs(float(p2.w.std()) - 0.1) < 0.01


def test_model_text_roundtrip(tmp_path, rng):
    n, k = 6, 3
    params, *_ = _random_model(rng, n, k)
    cfg = FMConfig(num_features=n, num_factors=k)
    p = str(tmp_path / "model.txt")
    save_model_text(params, cfg, p)
    loaded = load_model_text(cfg, p)
    np.testing.assert_allclose(np.asarray(loaded.w), np.asarray(params.w), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(loaded.v), np.asarray(params.v), rtol=1e-4)
    # section headers present for interop with the reference parser
    text = open(p).read()
    assert "#global bias W0" in text
    assert "#unary interactions Wj" in text
    assert "#pairwise interactions Vj,f" in text


def test_model_text_malformed_returns_none(tmp_path):
    cfg = FMConfig(num_features=4, num_factors=2)
    p = str(tmp_path / "bad.txt")
    with open(p, "w") as f:
        f.write("#global bias W0\n0.5\n#unary interactions Wj\n")  # truncated
    assert load_model_text(cfg, p) is None

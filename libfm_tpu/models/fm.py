"""The factorization machine model core.

TPU-native restatement of the reference model
(/root/reference/src/fm_core/fm_model.h:36-207):

    y(x) = w0 + sum_i w_i x_i
              + 0.5 * sum_f [ (sum_i v_if x_i)^2 - sum_i v_if^2 x_i^2 ]

the O(k*nnz) pairwise-interaction trick
(/root/reference/src/fm_core/fm_model.h:105-127). Here it is evaluated
over padded-CSR batches: `ids[B, L]` / `vals[B, L]` where padding entries
carry value 0 (so they contribute nothing); the factor matrix is stored
`V[n, k]` (feature-major, the embedding-table layout that row-shards over
a `model` mesh axis) rather than the reference's `v[k][n]`.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class FMConfig:
    """Static model configuration.

    Mirrors fm_model's `k0, k1, num_factor, num_attribute, init_stdev,
    init_mean, reg0/regw/regv` fields
    (/root/reference/src/fm_core/fm_model.h:51-60), with reference
    defaults dim=(1,1,8), init_stdev=0.1
    (/root/reference/src/libfm/libfm.cpp:118-120).
    """

    num_features: int
    num_factors: int = 8
    use_bias: bool = True  # k0
    use_linear: bool = True  # k1
    init_stdev: float = 0.1
    init_mean: float = 0.0
    reg0: float = 0.0
    regw: float = 0.0
    regv: float = 0.0
    dtype: jnp.dtype = jnp.float32


@jax.tree_util.register_pytree_node_class
@dataclass
class FMParams:
    """Model parameters as a pytree: w0 scalar, w[n], V[n, k]."""

    w0: jax.Array
    w: jax.Array
    v: jax.Array

    def tree_flatten(self):
        return (self.w0, self.w, self.v), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def num_features(self) -> int:
        return self.v.shape[0]

    @property
    def num_factors(self) -> int:
        return self.v.shape[1]


def init_fm(
    cfg: FMConfig, key: jax.Array, mcmc_style_w: bool = False
) -> FMParams:
    """Initialise parameters: w=0, V ~ N(init_mean, init_stdev)
    (/root/reference/src/fm_core/fm_model.h:91-99). For MCMC the reference
    additionally draws w ~ N(init_mean, init_stdev)
    (/root/reference/src/libfm/libfm.cpp:283)."""
    kv, kw = jax.random.split(key)
    v = cfg.init_mean + cfg.init_stdev * jax.random.normal(
        kv, (cfg.num_features, cfg.num_factors), dtype=cfg.dtype
    )
    if mcmc_style_w:
        w = cfg.init_mean + cfg.init_stdev * jax.random.normal(
            kw, (cfg.num_features,), dtype=cfg.dtype
        )
    else:
        w = jnp.zeros((cfg.num_features,), dtype=cfg.dtype)
    return FMParams(w0=jnp.zeros((), dtype=cfg.dtype), w=w, v=v)


def fm_batch_terms(params: FMParams, ids: jax.Array, vals: jax.Array, cfg: FMConfig):
    """Forward pass returning (pred[B], vsum[B, k]) where vsum_f =
    sum_i v_if x_i — the per-factor linear cache the SGD update reuses
    (the `sum` argument of fm_SGD, /root/reference/src/fm_core/fm_sgd.h:33).

    ids: int32 [B, L]; vals: float [B, L] with 0.0 at padding positions.
    """
    vx = params.v[ids] * vals[..., None]  # [B, L, k]
    vsum = vx.sum(axis=1)  # [B, k]
    vsq = (vx * vx).sum(axis=(1, 2))  # [B]
    pred = 0.5 * ((vsum * vsum).sum(axis=1) - vsq)
    if cfg.use_linear:
        pred = pred + (params.w[ids] * vals).sum(axis=1)
    if cfg.use_bias:
        pred = pred + params.w0
    return pred, vsum


def fm_batch_predict(
    params: FMParams, ids: jax.Array, vals: jax.Array, cfg: FMConfig
) -> jax.Array:
    """Raw (un-clamped, un-linked) FM scores for a padded batch."""
    pred, _ = fm_batch_terms(params, ids, vals, cfg)
    return pred


def predict_dense(
    params: FMParams, X: jax.Array, cfg: FMConfig, precision="highest"
) -> jax.Array:
    """Dense-matmul forward for wide-but-dense inputs: uses the MXU via
    two [B,n]x[n,k] matmuls instead of gathers. X: [B, n].

    precision='highest' keeps full fp32 MXU passes; pass 'default' to
    allow bf16 passes when speed matters more than the last ~3 digits.
    """
    xv = jnp.dot(
        X, params.v, preferred_element_type=jnp.float32, precision=precision
    )  # [B, k]
    x2v2 = jnp.dot(
        X * X,
        params.v * params.v,
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    pred = 0.5 * ((xv * xv).sum(axis=1) - x2v2.sum(axis=1))
    if cfg.use_linear:
        pred = pred + jnp.dot(
            X, params.w, preferred_element_type=jnp.float32, precision=precision
        )
    if cfg.use_bias:
        pred = pred + params.w0
    return pred


# ----------------------------------------------------------------- io


def save_model_text(params: FMParams, cfg: FMConfig, path: str) -> None:
    """Write the reference's text model format for interop:
    `#global bias W0`, `#unary interactions Wj`, `#pairwise interactions
    Vj,f` sections (/root/reference/src/fm_core/fm_model.h:132-154)."""
    w0 = float(params.w0)
    w = np.asarray(params.w, dtype=np.float64)
    v = np.asarray(params.v, dtype=np.float64)  # [n, k]
    with open(path, "w") as f:
        if cfg.use_bias:
            f.write("#global bias W0\n")
            f.write(f"{_fmt(w0)}\n")
        if cfg.use_linear:
            f.write("#unary interactions Wj\n")
            for i in range(cfg.num_features):
                f.write(f"{_fmt(w[i])}\n")
        f.write("#pairwise interactions Vj,f\n")
        for i in range(cfg.num_features):
            f.write(" ".join(_fmt(x) for x in v[i]) + "\n")


def load_model_text(cfg: FMConfig, path: str) -> FMParams | None:
    """Read the reference text model format. Returns None on malformed
    input (the reference re-inits with a warning:
    /root/reference/src/libfm/libfm.cpp:262-268)."""
    try:
        with open(path, "r") as f:
            lines = [l.rstrip("\n") for l in f]
    except OSError:
        return None
    it = iter(lines)
    try:
        w0 = 0.0
        if cfg.use_bias:
            next(it)  # header
            w0 = float(next(it))
        w = np.zeros(cfg.num_features, dtype=np.float64)
        if cfg.use_linear:
            next(it)
            for i in range(cfg.num_features):
                w[i] = float(next(it))
        next(it)
        v = np.zeros((cfg.num_features, cfg.num_factors), dtype=np.float64)
        for i in range(cfg.num_features):
            row = next(it).split(" ")
            if len(row) != cfg.num_factors:
                return None
            v[i] = [float(x) for x in row]
    except (StopIteration, ValueError):
        return None
    return FMParams(
        w0=jnp.asarray(w0, dtype=cfg.dtype),
        w=jnp.asarray(w, dtype=cfg.dtype),
        v=jnp.asarray(v, dtype=cfg.dtype),
    )


def _fmt(x: float) -> str:
    # match C++ ostream default formatting (6 significant digits)
    return f"{x:.6g}"

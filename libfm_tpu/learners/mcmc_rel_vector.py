"""Relational (BS) vector-sweep MCMC/ALS engine — the fat-block fast path.

The exact BS engine (learners/mcmc_relational.py) restates the
reference's per-coordinate relational cache algebra
(/root/reference/src/libfm/src/fm_learn_mcmc.h:734-790, 849-909) and is
row-op-latency bound on TPU: every factor does per-block small
gather/segment/scatter passes. The expansion fast path (thin joins)
materialises the join and pays O(num_cases) per conflict-free block.
This engine keeps the VLDB'13 dedup advantage — per-feature draw cost
O(nnz(block)), NOT O(expanded nnz) — while drawing each block feature's
whole parameter vector theta_j = (w_j, v_j1..v_jk) jointly with the same
blocked-Cholesky machinery as the flat vector engine
(learners/mcmc_vector.py).

The algebra (new; generalises the reference's scalar caches wc/wc_sqr/
we/weq to the joint draw):

- At the start of a relation's sweep, freeze per-block-row caches from
  the per-case table A = [e | Q]:

      wnum_b          (#train cases joined to block row b, static)
      we0_b  = sum_c e(c)            SQ0_b  = sum_c Q(c)        [k]
      SQe0_b = sum_c Q(c) e(c) [k]   SQQ0_b = sum_c Q(c)Q(c)^T  [k,k]

  one O(num_cases * k^2) MXU pass, once per relation per iteration.

- During the sweep the per-case state evolves ONLY through per-row
  quantities: after drawing features with deltas (dw_j, dv_j),

      e(c) = e0(c) + s_b + dQB_b . Q0(c),     Q(c) = Q0(c) + dQB_b

  where dQB_b = sum_j x_bj dv_j and
  s_b += x (dw_j + dv_j . (dQB_b^(pre) - x v_j^old)). Every cache a
  later feature needs is therefore available in closed form:

      we_b   = we0_b + wnum_b s_b + SQ0_b . dQB_b
      SQ_b   = SQ0_b + wnum_b dQB_b
      SQe_b  = SQe0_b + s_b SQ0_b + SQQ0_b dQB_b + dQB_b we_b
      SQQ_b  = SQQ0_b + dQB_b oxo SQ0_b + SQ0_b oxo dQB_b
               + wnum_b dQB_b oxo dQB_b

- A feature j's joint-draw sufficient statistics over the EXPANDED
  cases reduce to x-power-weighted sums of those caches over its block
  entries (b, x) — the per-case moment identity of the flat engine's
  case-major stats (mcmc_vector.py "Case-major stats") evaluated per
  block row:

      m2 += x^2 wnum_b   m3 += x^3 wnum_b   m4 += x^4 wnum_b
      mxe += x we_b      m2e += x^2 we_b
      S2 += x^2 SQ_b     S3 += x^3 SQ_b     SQe += x SQe_b
      M2 += x^2 SQQ_b

  then the blocked statistic [Qq | qa | qe | aa | ae] is reconstructed
  with the same v_j-free identities and the draw is the same rank-1
  Schur blocked Cholesky as the flat engine. Equality of these
  statistics with a sweep over the materialised join is the same
  identity the reference's caches implement (fm_learn_mcmc.h:175,259
  complexity notes) — tested against a dense expanded oracle in
  tests/test_mcmc_rel_vector.py.

- After the relation's sweep, ONE O(num_cases) pass resyncs A:
  e += s[map] + dQB[map] . Q;  Q += dQB[map]
  (e first — the correction needs the stale Q0).

Per iteration the engine therefore does a handful of O(num_cases)
passes (cache build, resync, refresh) plus O(nnz(blocks)) feature math —
independent of the expansion ratio. Main-table features (if any) are
swept per case over A with a compact slot path (the BS main table is
small by construction; the flat engine remains the fast path for flat
data).

Conflict-free blocks are over BLOCK rows (no two features of a block
share a block row), so no train case is touched twice within a block
and the parallel joint draws equal a sequential scan — the same
argument as the flat engine. Same-shape blocks are stacked and run
under one lax.scan so compile size stays bounded when a relation
decomposes into many small blocks.

A `(data, model)` mesh on the learner shards the per-case state the
same way as the flat engine: A = [e | Q] and the chunked per-case
arrays over `data`, w/V (and the draw math that consumes them) over
`model`; the nb-sized per-block-row caches replicate (nb << num_cases
in the fat-block regime by definition). Parity is asserted in
tests/test_mcmc_rel_vector.py::test_bs_vector_sharded_matches_single.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from libfm_tpu.data.batching import conflict_free_blocks
from libfm_tpu.data.dataset import Dataset
from libfm_tpu.data.vector_layout import padded_rows_layout
from libfm_tpu.learners.mcmc import (
    MCMCState,
    draw_alpha,
    draw_theta_hyperpriors,
    _masked_acc_ll,
    _masked_auc,
    _masked_rmse_mae,
)
from libfm_tpu.ops import samplers
from libfm_tpu.ops.lane_chol import (
    cholesky_lanes,
    solve_lower_lanes,
    solve_upper_lanes,
)
from libfm_tpu.ops.segment import seg_sum
from libfm_tpu.tasks import TASK_REGRESSION
from libfm_tpu.utils.timers import iter_clocks


def _einsum_hp(*args, **kwargs):
    """einsum pinned to full-f32 multiply precision: the within-sweep
    cache corrections cancel large terms (SQQ0 sums over hundreds of
    cases vs small dq deltas), and TPU's default bf16 einsum multiplies
    corrupt them enough to destabilise the chain (observed on the 1M-case
    fat-block probe: divergence at default precision, clean convergence
    at HIGHEST; CPU f32 never shows it)."""
    kwargs.setdefault("precision", jax.lax.Precision.HIGHEST)
    return jnp.einsum(*args, **kwargs)


def _pow2_at_least(x: int, lo: int = 8) -> int:
    p = lo
    while p < x:
        p <<= 1
    return p


# --------------------------------------------------------------------------
# Blocked (rank-1 Schur) joint draw from the [Qq|qa|qe|aa|ae] statistic.
# Same math as the flat engine's draw_chunk (mcmc_vector.py sweep_block);
# kept separate so this engine never perturbs the flat engine's traced
# graph (compile-cache stability).
# --------------------------------------------------------------------------


def blocked_theta_draw(GGf, thf, lamf, muf, zf, alpha, k: int, do_sample,
                       bound=None):
    """Draw theta = (w, v) ~ N(mean, Lam^-1) for a batch of features.

    GGf: [F, k*k + 2k + 2] blocked stats; thf/lamf/muf/zf: [F, 1+k].
    Returns (theta_new [F, 1+k], n_rejected scalar int32). Non-finite
    draws keep the old value (reference NaN guard, fm_learn_mcmc.h
    :700-724)."""
    if k == 0:
        aa = GGf[:, 0]
        ae = GGf[:, 1]
        prec = alpha * aa + lamf[:, 0]
        mean = (
            alpha * aa * thf[:, 0] - alpha * ae + lamf[:, 0] * muf[:, 0]
        ) / prec
        th_new = (mean + zf[:, 0] / jnp.sqrt(prec))[:, None]
        ok = jnp.isfinite(th_new)
        if bound is not None:
            ok = ok & (jnp.abs(th_new) <= bound)
        ok = ok.all(axis=1, keepdims=True)
        return (
            jnp.where(ok, th_new, thf),
            jnp.sum(~ok[:, 0]).astype(jnp.int32),
        )
    F = GGf.shape[0]
    Qq = GGf[:, : k * k].reshape(F, k, k)
    qa = GGf[:, k * k : k * k + k]
    qe = GGf[:, k * k + k : k * k + 2 * k]
    aa = GGf[:, k * k + 2 * k]
    ae = GGf[:, k * k + 2 * k + 1]
    th0, thv = thf[:, 0], thf[:, 1:]
    lam0, lamv = lamf[:, 0], lamf[:, 1:]
    # b = alpha * HtH theta_old - alpha * Ht e + lam * mu (e contains the
    # feature's own current contribution; HtH theta_old removes it)
    b0 = alpha * (aa * th0 + (qa * thv).sum(-1)) - alpha * ae + lam0 * muf[:, 0]
    bv = (
        alpha * (qa * th0[:, None] + _einsum_hp("fij,fj->fi", Qq, thv))
        - alpha * qe
        + lamv * muf[:, 1:]
    )
    s0 = jnp.sqrt(alpha * aa + lam0)
    col = alpha * qa / s0[:, None]
    S = (
        alpha * Qq
        + jax.vmap(jnp.diag)(lamv)
        - _einsum_hp("fi,fj->fij", col, col)
    )
    cholS = cholesky_lanes(S)
    y0 = b0 / s0
    yv = solve_lower_lanes(cholS, bv - col * y0[:, None])
    if do_sample:
        y0 = y0 + zf[:, 0]
        yv = yv + zf[:, 1:]
    xv = solve_upper_lanes(cholS, yv)
    x0 = (y0 - (col * xv).sum(-1)) / s0
    th_new = jnp.concatenate([x0[:, None], xv], axis=1)
    ok = jnp.isfinite(th_new)
    if bound is not None:
        ok = ok & (jnp.abs(th_new) <= bound)
    ok = ok.all(axis=1, keepdims=True)
    return jnp.where(ok, th_new, thf), jnp.sum(~ok[:, 0]).astype(jnp.int32)


# --------------------------------------------------------------------------
# Host-side layouts
# --------------------------------------------------------------------------


@dataclass
class _RelBlockStack:
    """Same-shape conflict-free blocks of one relation stacked for one
    lax.scan. Feature ids are GLOBAL (attr_offset applied); padded
    features point at the dedicated dummy parameter row n (never read),
    padded entries have x = 0 and block row nb (zero cache sentinel)."""

    feats: np.ndarray  # int32 [nblk, F_pad] global ids (pad -> n)
    entry_b: np.ndarray  # int32 [nblk, E_pad] block rows (pad -> nb)
    # scatter ids for the s/dQB updates: real entries == entry_b, pads
    # get UNIQUE dummy rows nb+1.. so the update scatter can take the
    # unique-indices fast path (duplicate pad ids force a sort pass)
    entry_bs: np.ndarray  # int32 [nblk, E_pad]
    entry_x: np.ndarray  # float32 [nblk, E_pad] (pad -> 0)
    entry_f: np.ndarray  # int32 [nblk, E_pad] block-LOCAL pos (monotone pad)
    F_pad: int
    E_pad: int


@dataclass
class _RelLayout:
    nb: int
    attr_offset: int
    num_features: int
    stacks: list  # list[_RelBlockStack]
    wnum: np.ndarray  # float [nb + 1] (sentinel 0)
    # block design (flat) for qB / sqB / linB per iteration
    rel_rows: np.ndarray  # int32 [nnzB] block rows
    rel_cols: np.ndarray  # int32 [nnzB] GLOBAL feature ids
    rel_vals: np.ndarray  # float32 [nnzB]
    # case-gather layout for the cache build: [nb_pad, Lb] case ids
    # (sentinel -> the zero row of A)
    case_rows: np.ndarray
    row_map_train: np.ndarray
    row_map_test: np.ndarray
    unobserved_local: np.ndarray


def _build_rel_layout(join_tr, join_te, attr_group, n: int):
    rd = join_tr.data
    nb = rd.num_cases
    for which, join in (("train", join_tr), ("test", join_te)):
        if len(join.row_map) and int(join.row_map.max()) >= nb:
            raise ValueError(
                f"relation join map ({which}) references block row "
                f"{int(join.row_map.max())} but the relation has only "
                f"{nb} rows — wrong relation file for this join map?"
            )
    ds = Dataset(
        rd.indptr, rd.cols, rd.vals, np.zeros(nb, dtype=np.float32),
        rd.num_features,
    )
    local_groups = attr_group[rd.attr_offset : rd.attr_offset + rd.num_features]
    blocks = conflict_free_blocks(ds, attr_group=local_groups)

    observed = (
        np.concatenate([b.features for b in blocks])
        if blocks
        else np.empty(0, np.int32)
    )
    mask = np.ones(rd.num_features, dtype=bool)
    if len(observed):
        mask[observed] = False
    unobserved = np.nonzero(mask)[0].astype(np.int32)

    # stack same-shape blocks for lax.scan (bounds compile size when a
    # relation decomposes into many small blocks)
    by_shape: dict = {}
    for b in blocks:
        F = len(b.features)
        E = len(b.entry_rows)
        F_pad, E_pad = _pow2_at_least(F), _pow2_at_least(E)
        feats = np.full(F_pad, n, np.int32)
        feats[:F] = b.features.astype(np.int64) + rd.attr_offset
        eb = np.full(E_pad, nb, np.int32)
        eb[:E] = b.entry_rows
        ebs = eb.copy()  # unique dummy rows for the pad tail
        ebs[E:] = nb + 1 + np.arange(E_pad - E, dtype=np.int32)
        ex = np.zeros(E_pad, np.float32)
        ex[:E] = b.entry_vals
        ef = np.full(E_pad, F_pad - 1, np.int32)  # monotone scatter pad
        ef[:E] = b.entry_feat
        by_shape.setdefault((F_pad, E_pad), []).append((feats, eb, ebs, ex, ef))
    stacks = [
        _RelBlockStack(
            feats=np.stack([t[0] for t in grp]),
            entry_b=np.stack([t[1] for t in grp]),
            entry_bs=np.stack([t[2] for t in grp]),
            entry_x=np.stack([t[3] for t in grp]),
            entry_f=np.stack([t[4] for t in grp]),
            F_pad=Fp,
            E_pad=Ep,
        )
        for (Fp, Ep), grp in sorted(by_shape.items())
    ]

    wnum = np.zeros(nb + 1, np.float64)
    wnum[:nb] = np.bincount(join_tr.row_map, minlength=nb)

    # case-gather layout: cases grouped by block row, padded to the max
    # row population (sentinel points at the zero row of A)
    order = np.argsort(join_tr.row_map, kind="stable")
    counts = wnum[:nb].astype(np.int64)
    Lb = int(counts.max()) if nb else 1
    Lb = max(Lb, 1)
    case_rows = np.full((nb, Lb), -1, np.int64)  # -1 replaced by sentinel
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    offs = np.arange(len(order), dtype=np.int64) - np.repeat(starts, counts)
    case_rows[join_tr.row_map[order], offs] = order

    return _RelLayout(
        nb=nb,
        attr_offset=rd.attr_offset,
        num_features=rd.num_features,
        stacks=stacks,
        wnum=wnum,
        rel_rows=ds.row_of_entry.astype(np.int32),
        rel_cols=(rd.cols.astype(np.int64) + rd.attr_offset).astype(np.int32),
        rel_vals=rd.vals.astype(np.float32),
        case_rows=case_rows,
        row_map_train=join_tr.row_map.astype(np.int32),
        row_map_test=join_te.row_map.astype(np.int32),
        unobserved_local=unobserved,
    )


def bs_vector_skew(train) -> float:
    """Padding blow-up of the per-relation case-gather layouts: the cache
    build pads each block row's case list to the row maximum, so heavily
    skewed joins (one block row joined by most cases) would gather far
    more slots than there are cases. The caller falls back to the exact
    BS engine above a threshold."""
    worst = 1.0
    for join in train.relations:
        nb = join.data.num_cases
        counts = np.bincount(join.row_map, minlength=nb)
        if counts.sum() == 0:
            continue
        worst = max(worst, nb * int(counts.max()) / max(1, len(join.row_map)))
    return worst


# --------------------------------------------------------------------------
# Engine
# --------------------------------------------------------------------------


def learn_relational_vector(learner, train: Dataset, test: Dataset):
    """Run the BS vector MCMC/ALS loop for `learner` (MCMCVectorLearner)."""
    cfg = learner.cfg
    f = learner.dtype
    # statistic-accumulation dtype (see mcmc_vector.py): f32 unless the
    # user asked for f64 — a literal f32 would downcast f64 operands
    acc_t = jnp.float64 if jnp.dtype(f) == jnp.float64 else jnp.float32
    n, k = cfg.num_features, cfg.num_factors
    d = 1 + k
    learner.min_target = train.min_target
    learner.max_target = train.max_target
    task = learner.task
    do_sample, do_multilevel = learner.do_sample, learner.do_multilevel
    alpha_0, gamma_0 = learner.alpha_0, learner.gamma_0
    beta_0, mu_0 = learner.beta_0, learner.mu_0
    min_t, max_t = learner.min_target, learner.max_target
    # f32 runaway bound for parameter draws (samplers.DRAW_BOUND)
    draw_bound = samplers.DRAW_BOUND * max(
        1.0, abs(float(min_t)), abs(float(max_t))
    )
    use_linear = cfg.use_linear
    use_bias = cfg.use_bias

    # ---- mesh / sharding plan (mirrors the flat engine's): the per-case
    # table A and the chunked per-case arrays shard over `data`; w/V
    # row-shard over `model` (TP); the per-block-row caches (nb-sized)
    # stay replicated — in the fat-block regime nb << num_cases by
    # construction. XLA's SPMD partitioner lowers the cross-shard
    # gathers/scatters to collectives.
    mesh = learner.mesh
    D = M = 1
    tp = False
    sh_model1 = sh_model2 = sh_A = sh_c3 = sh_c2 = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(mesh, P())
        D = mesh.shape["data"]
        M = mesh.shape.get("model", 1)
        tp = M > 1
        sh_model1 = NamedSharding(mesh, P("model")) if tp else repl
        sh_model2 = NamedSharding(mesh, P("model", None)) if tp else repl
        sh_A = NamedSharding(mesh, P("data", None)) if D > 1 else repl
        sh_c3 = NamedSharding(mesh, P(None, "data", None)) if D > 1 else repl
        sh_c2 = NamedSharding(mesh, P(None, "data")) if D > 1 else repl

    attr_group_np = learner.attr_group_np
    if attr_group_np is None:
        attr_group_np = np.zeros(n, dtype=np.int32)
    G = int(attr_group_np.max()) + 1
    num_attr_per_group = jnp.asarray(
        np.bincount(attr_group_np, minlength=G).astype(np.float64), dtype=f
    )
    # the dummy parameter row n absorbs padded-feature draws; `valid`
    # masks it out of the hyperprior group statistics. Under TP the
    # parameter table pads to a multiple of the model axis (rows n..R-1
    # sit in no block; only row n is ever written, by padded draws).
    R = ((n + 1 + M - 1) // M) * M if tp else n + 1
    attr_group = jnp.asarray(np.pad(attr_group_np, (0, R - n)))
    valid = jnp.asarray(
        (np.arange(R) < n).astype(np.float64), dtype=f
    )

    nc_train, nc_test = train.num_rows, test.num_rows

    # ---- relation layouts ----
    rels = [
        _build_rel_layout(jt, je, attr_group_np, n)
        for jt, je in zip(train.relations, test.relations)
    ]
    n_main = rels[0].attr_offset if rels else train.num_features

    # ---- main-table layout (slot path; BS main tables are small) ----
    main_blocks_host = conflict_free_blocks(
        train, attr_group=attr_group_np[: max(train.num_features, 1)]
    )
    observed = (
        np.concatenate([b.features for b in main_blocks_host])
        if main_blocks_host
        else np.empty(0, np.int32)
    )
    mask = np.ones(max(n_main, 1), dtype=bool)
    if len(observed):
        mask[observed] = False
    main_unobs = np.nonzero(mask[:n_main])[0].astype(np.int32)
    unobs_ids = [main_unobs] + [
        (r.unobserved_local + r.attr_offset).astype(np.int32) for r in rels
    ]
    unobserved = jnp.asarray(np.concatenate(unobs_ids))
    n_unobs = int(unobserved.shape[0])

    # A = [e | Q] per train case + a padding tail: row CASE_PAD..CASE_PAD+
    # SLOT_PAD-1 are zero dummy rows (unique ids for padded main slots,
    # sentinel for the relation case-gather layouts).
    CU = 1 << 17
    if mesh is not None and D > 1:
        # the [*, CU, ...] per-case chunks shard over the data axis, and
        # device_put requires exact divisibility — round CU to a D
        # multiple (a no-op for power-of-two axes)
        CU = max(D, (CU // D) * D)
    nc_pad = ((max(nc_train, 1) + CU - 1) // CU) * CU

    # main slot buckets, chunked for lax.scan like the flat engine
    SLOT_BUDGET = 1 << 18
    SEG_BUDGET = 8192
    from libfm_tpu.data.vector_layout import build_block_layout

    main_dev = []
    MAIN_F = []  # static per-block feature counts (Python closure)
    slot_pad_max = 1
    for b in main_blocks_host:
        lay = build_block_layout(
            b.features, b.entry_rows, b.entry_vals, b.entry_feat,
            attr_group_np[b.features], nc_train, learner.widths,
        )
        F = lay.num_features
        buckets = []
        for wb in lay.buckets:
            C = max(1, min(SLOT_BUDGET // wb.width, SEG_BUDGET))
            pad = (-len(wb.seg_feat)) % C
            sc, sv, sf = wb.slot_case, wb.slot_val, wb.seg_feat
            if pad:
                sc = np.concatenate(
                    [sc, np.full((pad, wb.width), nc_train, np.int32)]
                )
                sv = np.concatenate([sv, np.zeros((pad, wb.width), np.float32)])
                sf = np.concatenate(
                    [sf, np.full(pad, max(len(lay.features) - 1, 0), np.int32)]
                )
            nchunk = len(sf) // C
            sc = sc.reshape(nchunk, C, wb.width).copy()
            sv = sv.reshape(nchunk, C, wb.width)
            sf = sf.reshape(nchunk, C)
            # unique dummy ids for padding slots (scatter fast path)
            pos = np.arange(C * wb.width, dtype=np.int64).reshape(C, wb.width)
            slot_pad_max = max(slot_pad_max, C * wb.width)
            for ci in range(nchunk):
                m = sc[ci] == nc_train
                sc[ci][m] = nc_pad + pos[m]
            buckets.append(
                (jnp.asarray(sc), jnp.asarray(sv, dtype=f), jnp.asarray(sf))
            )
        main_dev.append(
            dict(
                feats=jnp.asarray(lay.features),
                groups=jnp.asarray(lay.groups),
                buckets=buckets,
            )
        )
        MAIN_F.append(F)
    if mesh is not None:  # A rows must divide evenly over the data axis
        slot_pad_max = ((slot_pad_max + D - 1) // D) * D

    # Incremental test predictions (round 5, VERDICT r4 item 2): when
    # the dataset is PURE block structure (no main-table features — the
    # classic VLDB'13 recommender shape), test rows ride in a tail
    # region of A as [pred | Q] and consume the same per-relation
    # resync/w0 deltas the train rows do (test rows contribute zero
    # stats by construction — they appear in no slot layout). The
    # per-iteration test P-gather disappears; the periodic refresh
    # re-grounds the tail exactly like the train region. The reference
    # fills its test e-term cache inside the same joint prediction pass
    # (fm_learn_mcmc.h:148-378) — this is the incremental analog.
    # With main-table features the main sweeps would leave the tail
    # stale, so the gather path stays.
    nc_te_pad_a = ((max(nc_test, 1) + CU - 1) // CU) * CU
    incr_test = (
        len(main_blocks_host) == 0
        and nc_test > 0
        and getattr(learner, "bs_incr_test", True)
    )
    TEST_OFF = nc_pad + slot_pad_max
    A_rows = nc_pad + slot_pad_max + (nc_te_pad_a if incr_test else 0)

    # re-point relation case-gather sentinels at the first dummy row
    for r in rels:
        r.case_rows = np.where(r.case_rows < 0, nc_pad, r.case_rows)

    # ---- device statics ----
    def _chunk_map(row_map, nb, ncase_pad):
        m = np.full(ncase_pad, nb, np.int32)
        m[: len(row_map)] = row_map
        return jnp.asarray(m.reshape(-1, CU))

    # test rows padded for prediction
    _L_te = max(1, int(np.diff(test.indptr).max()) if test.nnz else 1)
    _L_tr = max(1, int(np.diff(train.indptr).max()) if train.nnz else 1)
    nc_te_pad = ((max(nc_test, 1) + CU - 1) // CU) * CU

    def _chunk_rows(ids_np, vals_np, ncase_pad, L):
        nr = ids_np.shape[0]
        ids = np.zeros((ncase_pad, L), np.int32)
        vals = np.zeros((ncase_pad, L), np.float32)
        ids[:nr, : ids_np.shape[1]] = ids_np
        vals[:nr, : vals_np.shape[1]] = vals_np
        return (
            jnp.asarray(ids.reshape(-1, CU, L)),
            jnp.asarray(vals.reshape(-1, CU, L), dtype=f),
        )

    tr_ids, tr_pv = _chunk_rows(
        *padded_rows_layout(train.indptr, train.cols, train.vals),
        nc_pad, _L_tr,
    )
    te_ids, te_pv = _chunk_rows(
        *padded_rows_layout(test.indptr, test.cols, test.vals),
        nc_te_pad, _L_te,
    )

    y_tr_pad = np.zeros(nc_pad, np.float64)
    y_tr_pad[:nc_train] = np.asarray(train.target, dtype=np.float64)
    m_tr_pad = np.zeros(nc_pad, bool)
    m_tr_pad[:nc_train] = True
    y_test = jnp.asarray(test.target, dtype=f)
    nec = learner.num_eval_cases if learner.num_eval_cases is not None else nc_test
    eval_mask = jnp.asarray((np.arange(nc_test) < nec).astype(np.float64), dtype=f)

    # cache-build row chunking: [RC, Lb, 1+k] gather temps <= ~128MB
    def _chunk_case_rows(case_rows):
        nb, Lb = case_rows.shape
        RC = max(1, min(nb, (128 << 20) // max(1, Lb * (1 + k) * 4)))
        if mesh is not None:  # RC rows shard over the data axis
            RC = max(D, (RC // D) * D)
        pad = (-nb) % RC
        if pad:
            case_rows = np.concatenate(
                [case_rows, np.full((pad, Lb), nc_pad, np.int64)]
            )
        return jnp.asarray(
            case_rows.reshape(-1, RC, Lb).astype(np.int32)
        )

    # Slab-partitioned cache-build layout. Random row gathers from a
    # table that fits on-chip run ~20x faster than from a big one
    # (measured cliff: ~2.2 ns/row up to ~20 MB, ~45 ns/row past
    # ~60 MB — BENCHNOTES "Gather cost vs table size"). The per-block
    # case sums are order-free, so the (static) case ids can be grouped
    # by ~18 MB slab of A and each group gathered from a dynamic slice
    # of A that XLA keeps chip-resident; partial moments then just add.
    # Measured on the BS probe shape: 55 -> 9.2 ms for the gather+sum.
    # Single-device only (the mesh path shards case chunks over `data`).
    _SLAB_BYTES = 18 << 20
    # threshold overridable for tests (force the slab path on small
    # problems by setting learner._slab_threshold_bytes = 0); tests
    # also shrink the slab size to get >1 slab on tiny tables
    _slab_thresh = getattr(learner, "_slab_threshold_bytes", 32 << 20)
    _SLAB_BYTES = getattr(learner, "_slab_bytes", _SLAB_BYTES)
    _use_slabs = mesh is None and A_rows * (1 + k) * 4 > _slab_thresh

    def _slab_case_layout(case_rows):
        if not _use_slabs:
            return None
        nb, Lb = case_rows.shape
        rows_per = max(8, (_SLAB_BYTES // ((1 + k) * 4)) // 8 * 8)
        slabs = []
        for lo in range(0, A_rows, rows_per):
            hi = min(lo + rows_per, A_rows)
            m = (case_rows >= lo) & (case_rows < hi) & (case_rows != nc_pad)
            Lb_s = int(m.sum(axis=1).max())
            if Lb_s == 0:
                continue  # dummy-row region or empty slab
            order = np.argsort(~m, axis=1, kind="stable")[:, :Lb_s]
            g = np.take_along_axis(case_rows, order, axis=1) - lo
            w = np.take_along_axis(m, order, axis=1)
            g = np.where(w, g, 0).astype(np.int32)
            # chunk nb so the [CHb, Lb_s, 1+k] gather temp stays <=96MB
            CHb = max(1, min(nb, (96 << 20) // max(1, Lb_s * (1 + k) * 4)))
            pad = (-nb) % CHb
            if pad:
                g = np.concatenate([g, np.zeros((pad, Lb_s), np.int32)])
                w = np.concatenate([w, np.zeros((pad, Lb_s), bool)])
            # (lo, size) stay PYTHON ints in the closure-side meta list —
            # ints inside the jit-passed statics dict would be traced
            slabs.append(
                (
                    (lo, hi - lo),
                    dict(
                        g=jnp.asarray(g.reshape(-1, CHb, Lb_s)),
                        w=jnp.asarray(
                            w.reshape(-1, CHb, Lb_s).astype(np.float32),
                            dtype=f,
                        ),
                    ),
                )
            )
        return slabs

    # static per-relation metadata lives in Python closures (ints inside
    # the jit-passed statics dict would be traced)
    REL_NB = [r.nb for r in rels]
    REL_SHAPES = [[(st.F_pad, st.E_pad) for st in r.stacks] for r in rels]
    # Deferred per-case work (round 5): for SINGLE-relation pure-BS
    # regression, the per-case cache rebuild and resync move to the
    # refresh cadence — the frozen block-row caches + the accumulated
    # SD = [s | dQB] describe every case's (e, Q) exactly (the same
    # corrected() algebra the within-sweep draws already use), so fast
    # iterations touch only O(nb k^2) block-level state: alpha/w0 and
    # the train metric come from closed-form sums (_deferred_sums), and
    # test predictions read the refresh-frozen A tail + SD[map]. Gated:
    # classification resamples per-case latents every iteration, and
    # MULTIPLE relations would need cross-relation joint aggregates for
    # the e^2 sums; both keep the per-iteration resync path.
    deferred = (
        task == TASK_REGRESSION
        and len(rels) == 1
        and not main_blocks_host
        and incr_test
        and mesh is None
        and getattr(learner, "bs_deferred", True)
        and not getattr(learner, "_skip_phases", frozenset())
    )
    _ext0 = (
        max((Ep for (_, Ep) in REL_SHAPES[0]), default=1) if deferred else 0
    )
    _slabs_all = [_slab_case_layout(r.case_rows) for r in rels]
    # static (lo, size) metadata in the closure; device arrays in statics
    REL_SLAB_META = [
        None if sl is None else [meta for meta, _ in sl] for sl in _slabs_all
    ]
    REL_SLABS = [
        None if sl is None else [arrs for _, arrs in sl] for sl in _slabs_all
    ]
    dev_rels = [
        dict(
            stacks=[
                dict(
                    feats=jnp.asarray(st.feats),
                    entry_b=jnp.asarray(st.entry_b),
                    entry_bs=jnp.asarray(st.entry_bs),
                    entry_x=jnp.asarray(st.entry_x, dtype=f),
                    entry_f=jnp.asarray(st.entry_f),
                )
                for st in r.stacks
            ],
            wnum=jnp.asarray(r.wnum, dtype=f),  # [nb+1]
            rel_rows=jnp.asarray(r.rel_rows),
            rel_cols=jnp.asarray(r.rel_cols),
            rel_vals=jnp.asarray(r.rel_vals, dtype=f),
            case_rows=_chunk_case_rows(r.case_rows),
            slab_rows=REL_SLABS[ri],
            map_tr=_chunk_map(r.row_map_train, r.nb, nc_pad),
            map_te=_chunk_map(r.row_map_test, r.nb, nc_te_pad),
        )
        for ri, r in enumerate(rels)
    ]

    # ---- init ----
    key = jax.random.PRNGKey(learner.seed)
    key, kw, kv = jax.random.split(key, 3)
    w = cfg.init_mean + cfg.init_stdev * jax.random.normal(kw, (n,), dtype=f)
    V = cfg.init_mean + cfg.init_stdev * jax.random.normal(kv, (n, k), dtype=f)
    w0_init = jnp.zeros((), f)
    if learner.warm_start is not None:  # MCMCLearner.__init__: only w0/V load
        V = jnp.asarray(learner.warm_start.v, dtype=f)
        w0_init = jnp.asarray(learner.warm_start.w0, dtype=f)
    if not use_linear:
        w = jnp.zeros((n,), f)
    # dummy row n for padded-feature draws (never read back); under TP
    # the extra rows pad w/V to a model-axis multiple (R)
    w = jnp.pad(w, (0, R - n))
    V = jnp.pad(V, ((0, R - n), (0, 0)))
    if mesh is not None:
        w = jax.device_put(w, sh_model1)
        V = jax.device_put(V, sh_model2)
    w_lambda = (
        jnp.asarray(learner._w_lambda_vec, dtype=f)
        if learner._w_lambda_vec is not None
        else jnp.full((G,), learner._init_w_lambda, dtype=f)
    )
    v_lambda = (
        jnp.asarray(learner._v_lambda_vec, dtype=f)
        if learner._v_lambda_vec is not None
        else jnp.full((G, k), learner._init_v_lambda, dtype=f)
    )

    statics = dict(
        dev_rels=dev_rels,
        main_dev=main_dev,
        tr_ids=tr_ids, tr_pv=tr_pv, te_ids=te_ids, te_pv=te_pv,
        y_tr_ch=jnp.asarray(y_tr_pad.reshape(-1, CU), dtype=f),
        mask_tr_ch=jnp.asarray(m_tr_pad.reshape(-1, CU), dtype=f),
        mask_te_ch=jnp.asarray(
            (np.arange(nc_te_pad_a) < nc_test)
            .astype(np.float64).reshape(-1, CU),
            dtype=f,
        ),
        y_test=y_test, eval_mask=eval_mask,
        attr_group=attr_group, num_attr_per_group=num_attr_per_group,
        unobserved=unobserved, valid=valid,
    )
    if mesh is not None:
        # per-case chunk arrays shard over `data` (everything else —
        # block stacks, nb-sized caches, hyperprior tables — replicates)
        for key3 in ("tr_ids", "tr_pv", "te_ids", "te_pv"):
            statics[key3] = jax.device_put(statics[key3], sh_c3)
        for key2 in ("y_tr_ch", "mask_tr_ch", "mask_te_ch"):
            statics[key2] = jax.device_put(statics[key2], sh_c2)
        for dr in statics["dev_rels"]:
            dr["case_rows"] = jax.device_put(dr["case_rows"], sh_c3)
            dr["map_tr"] = jax.device_put(dr["map_tr"], sh_c2)
            dr["map_te"] = jax.device_put(dr["map_te"], sh_c2)

    # ---------------- prediction / refresh ----------------
    def _rel_scores(w, V, S):
        """Per relation: (qB [nb+1, k], sqB [nb+1], linB [nb+1]) from the
        block design (sentinel row nb stays zero)."""
        out = []
        for nb, dr in zip(REL_NB, S["dev_rels"]):
            vx = V[dr["rel_cols"]] * dr["rel_vals"][:, None]  # [nnzB, k]
            qB = seg_sum(vx, dr["rel_rows"], nb + 1)
            sqB = seg_sum((vx * vx).sum(axis=1), dr["rel_rows"], nb + 1)
            linB = (
                seg_sum(w[dr["rel_cols"]] * dr["rel_vals"], dr["rel_rows"], nb + 1)
                if use_linear
                else jnp.zeros((nb + 1,), f)
            )
            out.append((qB, sqB, linB))
        return out

    def _chunk_pred(w0, w, V, cids, cpv, maps_c, scores):
        """(pred [CU], Q [CU, k]) for one case chunk: main rows + joined
        block scores."""
        rows_v = V[cids] * cpv[..., None]  # [CU, L, k]
        Q = rows_v.sum(axis=1)
        sq = (rows_v * rows_v).sum(axis=(1, 2))
        lin = (
            (w[cids] * cpv).sum(axis=1) if use_linear else jnp.zeros(sq.shape, f)
        )
        for mb, (qB, sqB, linB) in zip(maps_c, scores):
            Q = Q + qB[mb]
            sq = sq + sqB[mb]
            if use_linear:
                lin = lin + linB[mb]
        pred = 0.5 * ((Q * Q).sum(axis=1) - sq)
        if use_linear:
            pred = pred + lin
        if use_bias:
            pred = pred + w0
        return pred, Q

    def refresh_A_and_train_metric(w0, w, V, key, S, A, init=False,
                                   scores=None):
        if scores is None:
            scores = _rel_scores(w, V, S)
        nchunk = S["tr_ids"].shape[0]
        ckeys = jax.random.split(key, nchunk)
        maps = [dr["map_tr"] for dr in S["dev_rels"]]

        def chunk(carry, inp):
            A, acc0, acc1 = carry
            ci, cids, cpv, cy, cm, ck = inp[:6]
            maps_c = inp[6:]
            pred, Q = _chunk_pred(w0, w, V, cids, cpv, maps_c, scores)
            if task == TASK_REGRESSION or init:
                err = (jnp.clip(pred, min_t, max_t) - cy) * cm
                acc0 = acc0 + (err * err).sum()
                acc1 = acc1 + cm.sum()
                e = pred - cy
            else:
                pp = samplers.cdf_gaussian(pred)
                correct = ((pp >= 0.5) & (cy > 0.0)) | ((pp < 0.5) & (cy < 0.0))
                acc0 = acc0 + (correct.astype(f) * cm).sum()
                acc1 = acc1 + cm.sum()
                if do_sample:
                    lat_pos = samplers.left_truncated_gaussian(ck, 0.0, pred, 1.0)
                    lat_neg = samplers.right_truncated_gaussian(ck, 0.0, pred, 1.0)
                else:
                    lat_pos = samplers.left_tn_expectation(pred)
                    lat_neg = samplers.right_tn_expectation(pred)
                latent = jnp.where(cy >= 0.0, lat_pos, lat_neg)
                e = pred - latent
            if task == TASK_REGRESSION or init:
                latent = cy
            rows = jnp.concatenate([e[:, None], Q], axis=1) * cm[:, None]
            A = jax.lax.dynamic_update_slice(A, rows, (ci * CU, 0))
            return (A, acc0, acc1), latent * cm

        (A, m0, m1), lat = jax.lax.scan(
            chunk,
            (A, jnp.zeros((), f), jnp.zeros((), f)),
            (
                jnp.arange(nchunk, dtype=jnp.int32),
                S["tr_ids"], S["tr_pv"], S["y_tr_ch"], S["mask_tr_ch"], ckeys,
                *maps,
            ),
        )
        if incr_test:
            # re-ground the incremental test tail: [pred | Q] rows
            maps_te = [dr["map_te"] for dr in S["dev_rels"]]

            def te_chunk(A, inp):
                ci, cids, cpv, cm = inp[:4]
                pred, Q = _chunk_pred(w0, w, V, cids, cpv, inp[4:], scores)
                rows = jnp.concatenate([pred[:, None], Q], axis=1)
                rows = rows * cm[:, None]
                return jax.lax.dynamic_update_slice(
                    A, rows, (TEST_OFF + ci * CU, 0)
                ), None

            A, _ = jax.lax.scan(
                te_chunk, A,
                (
                    jnp.arange(S["te_ids"].shape[0], dtype=jnp.int32),
                    S["te_ids"], S["te_pv"], S["mask_te_ch"], *maps_te,
                ),
            )
        m1 = jnp.maximum(m1, 1.0)
        train_metric = jnp.sqrt(m0 / m1) if task == TASK_REGRESSION else m0 / m1
        return A, train_metric, lat

    def predict_test(w0, w, V, S, scores=None, A=None):
        if "pred" in _skip:
            return jnp.zeros((nc_test,), f)
        if incr_test and A is not None:
            # incremental tail: the sweeps' resync + w0 deltas maintain
            # [pred | Q] for test rows; one slice instead of a P-gather
            return A[TEST_OFF : TEST_OFF + nc_test, 0]
        if scores is None:
            scores = _rel_scores(w, V, S)
        maps = [dr["map_te"] for dr in S["dev_rels"]]

        def chunk(_, inp):
            cids, cpv = inp[0], inp[1]
            pred, _ = _chunk_pred(w0, w, V, cids, cpv, inp[2:], scores)
            return None, pred

        _, preds = jax.lax.scan(chunk, None, (S["te_ids"], S["te_pv"], *maps))
        return preds.reshape(-1)[:nc_test]

    # ---------------- main-table slot sweep ----------------
    def sweep_main_block(A, w, V, blk, F, alpha, w_mu_g, w_lambda_g,
                         v_mu_g, v_lambda_g, key):
        """Per-case joint draws for one main-table conflict-free block
        (compact slot path — stats + draw + scatter update)."""
        feats = blk["feats"]
        groups = blk["groups"]
        theta_old = jnp.concatenate([w[feats][:, None], V[feats]], axis=1)
        GW = k * k + 2 * k + 2
        GG = jnp.zeros((F, GW), f)

        def _slot_h(sc, sv, sf):
            A_slot = A[sc]
            e_slot = A_slot[..., 0]
            Q_slot = A_slot[..., 1:]
            v_seg = V[feats[sf]]
            qp = Q_slot - sv[..., None] * v_seg[:, None, :]
            h = jnp.concatenate([sv[..., None], sv[..., None] * qp], axis=-1)
            if not use_linear:
                h = h.at[..., 0].set(0.0)
            return e_slot, h

        for sc_a, sv_a, sf_a in blk["buckets"]:
            def stats_chunk(GG, inp):
                sc, sv, sf = inp
                e_slot, h = _slot_h(sc, sv, sf)
                a = h[..., 0]
                hq = h[..., 1:]
                Qq = _einsum_hp(
                    "swi,swj->sij", hq, hq,
                    preferred_element_type=acc_t,
                ).astype(f)
                qa = _einsum_hp("swi,sw->si", hq, a)
                qe = _einsum_hp("swi,sw->si", hq, e_slot)
                aa = (a * a).sum(axis=1)
                ae = (a * e_slot).sum(axis=1)
                Gseg = jnp.concatenate(
                    [Qq.reshape(Qq.shape[0], -1), qa, qe,
                     aa[:, None], ae[:, None]], axis=-1,
                )
                return GG.at[sf].add(Gseg, indices_are_sorted=True), None

            GG, _ = jax.lax.scan(stats_chunk, GG, (sc_a, sv_a, sf_a))

        lam = jnp.concatenate(
            [w_lambda_g[groups][:, None], v_lambda_g[groups]], axis=1
        )
        mu_pr = jnp.concatenate(
            [w_mu_g[groups][:, None], v_mu_g[groups]], axis=1
        )
        if not use_linear:
            lam = lam.at[:, 0].set(1e30)
            mu_pr = mu_pr.at[:, 0].set(0.0)
        if do_sample:
            key, kz = jax.random.split(key)
            z = jax.random.normal(kz, (F, d), dtype=f)
        else:
            z = jnp.zeros((F, d), f)
        theta_new, n_rej = blocked_theta_draw(
            GG, theta_old, lam, mu_pr, z, alpha, k, do_sample,
            bound=draw_bound,
        )
        delta = theta_new - theta_old

        # fused update table [F+1, d+1]: delta + s_j = v_old . dv
        s_col = _einsum_hp("fk,fk->f", theta_old[:, 1:], delta[:, 1:])
        upd_tab = jnp.concatenate([delta, s_col[:, None]], axis=1)
        upd_tab = jnp.concatenate([upd_tab, jnp.zeros((1, d + 1), f)], axis=0)
        for sc_a, sv_a, sf_a in blk["buckets"]:
            def upd_chunk(A, inp):
                sc, sv, sf = inp
                Q_slot = A[sc][..., 1:]
                tab = upd_tab[jnp.minimum(sf, F)]
                dpred = sv * (
                    tab[:, None, 0]
                    + _einsum_hp("swk,sk->sw", Q_slot, tab[:, 1 : 1 + k])
                ) - (sv * sv) * tab[:, None, 1 + k]
                dQ = sv[..., None] * tab[:, None, 1 : 1 + k]
                drows = jnp.concatenate([dpred[..., None], dQ], axis=-1)
                A = A.at[sc.reshape(-1)].add(
                    drows.reshape(-1, 1 + k), unique_indices=True
                )
                return A, None

            A, _ = jax.lax.scan(upd_chunk, A, (sc_a, sv_a, sf_a))

        w = w.at[feats].set(theta_new[:, 0], unique_indices=True)
        V = V.at[feats].set(theta_new[:, 1:], unique_indices=True)
        return A, w, V, n_rej, key

    # ---------------- relation sweep ----------------
    # profiling-only trace-time phase skips (wrong results, real
    # timings) — mirrors the flat engine's _skip_phases bisection
    _skip = getattr(learner, "_skip_phases", frozenset())

    def build_rel_caches(A, dr, nb, slab_meta):
        """Frozen per-block-row caches (we0, we2_0, SQ0, SQe0, SQQ0),
        each with a zero sentinel row nb. we2_0 = sum e0^2 serves the
        deferred path's closed-form alpha/metric sums."""
        if "caches" in _skip:
            return (
                jnp.zeros((nb + 1,), f), jnp.zeros((nb + 1,), f),
                jnp.zeros((nb + 1, k), f),
                jnp.zeros((nb + 1, k), f), jnp.zeros((nb + 1, k, k), f),
            )

        def moments(rows):  # [RC, Lb(.s), 1+k] masked gathered rows
            e_r = rows[..., 0]
            Q_r = rows[..., 1:]
            we = e_r.sum(axis=1)
            we2 = (e_r * e_r).sum(axis=1)
            SQ = Q_r.sum(axis=1)
            SQe = (Q_r * e_r[..., None]).sum(axis=1)
            SQQ = _einsum_hp(
                "rlf,rlg->rfg", Q_r, Q_r,
                preferred_element_type=acc_t,
            ).astype(f)
            return we, we2, SQ, SQe, SQQ

        if dr["slab_rows"] is not None:
            # slab-partitioned gathers (see _slab_case_layout): each
            # slab's case rows gather from an on-chip slice of A; the
            # order-free per-block sums accumulate across slabs
            we = jnp.zeros((nb,), f)
            we2 = jnp.zeros((nb,), f)
            SQ = jnp.zeros((nb, k), f)
            SQe = jnp.zeros((nb, k), f)
            SQQ = jnp.zeros((nb, k, k), f)
            for (lo, size), sl in zip(slab_meta, dr["slab_rows"]):
                As = jax.lax.dynamic_slice_in_dim(A, lo, size)

                def chunk_s(_, gw, As=As):
                    g_c, w_c = gw
                    return None, moments(As[g_c] * w_c[..., None])

                _, (we_s, we2_s, SQ_s, SQe_s, SQQ_s) = jax.lax.scan(
                    chunk_s, None, (sl["g"], sl["w"])
                )
                nbp = we_s.shape[0] * we_s.shape[1]
                we = we + we_s.reshape(nbp)[:nb]
                we2 = we2 + we2_s.reshape(nbp)[:nb]
                SQ = SQ + SQ_s.reshape(nbp, k)[:nb]
                SQe = SQe + SQe_s.reshape(nbp, k)[:nb]
                SQQ = SQQ + SQQ_s.reshape(nbp, k, k)[:nb]
        else:
            def chunk(_, case_ids):  # [RC, Lb]
                return None, moments(A[case_ids])

            _, (we, we2, SQ, SQe, SQQ) = jax.lax.scan(
                chunk, None, dr["case_rows"]
            )
            nb_pad = we.shape[0] * we.shape[1]
            we = we.reshape(nb_pad)[:nb]
            we2 = we2.reshape(nb_pad)[:nb]
            SQ = SQ.reshape(nb_pad, k)[:nb]
            SQe = SQe.reshape(nb_pad, k)[:nb]
            SQQ = SQQ.reshape(nb_pad, k, k)[:nb]
        pad1 = ((0, 1),)
        return (
            jnp.pad(we, pad1),
            jnp.pad(we2, pad1),
            jnp.pad(SQ, ((0, 1), (0, 0))),
            jnp.pad(SQe, ((0, 1), (0, 0))),
            jnp.pad(SQQ, ((0, 1), (0, 0), (0, 0))),
        )

    def _deferred_sums(caches, SD, wnum, nb):
        """Closed-form (sum e, sum e^2) over the train cases from the
        frozen caches + accumulated SD: per block row b, every case
        satisfies e = e0 + c_b(Q0) with c_b = s_b + dq_b . Q0(case), so
          sum_b e   = we0 + wnum s + dq . SQ0
          sum_b e^2 = we2_0 + 2 s we0 + 2 dq . SQe0
                      + wnum s^2 + 2 s (dq . SQ0) + dq^T SQQ0 dq
        O(nb k^2) elementwise — no per-case pass. Exact for a SINGLE
        relation (cross-relation c_b1 c_b2 terms would need joint
        aggregates)."""
        we0, we2_0, SQ0, SQe0, SQQ0 = caches
        s = SD[: nb + 1, 0]
        dq = SD[: nb + 1, 1:]
        dqSQ = (dq * SQ0).sum(-1)
        sum_e = we0 + wnum * s + dqSQ
        dqSQQdq = jnp.einsum(
            "bf,bfg,bg->b", dq, SQQ0, dq,
            preferred_element_type=acc_t,
        ).astype(f)
        sum_e2 = (
            we2_0 + 2.0 * s * we0 + 2.0 * (dq * SQe0).sum(-1)
            + wnum * s * s + 2.0 * s * dqSQ + dqSQQdq
        )
        return sum_e.sum(), sum_e2.sum()

    def sweep_relation(A, w, V, dr, nb, shapes, slab_meta, alpha, w_mu_g,
                       w_lambda_g,
                       v_mu_g, v_lambda_g, key, caches=None, SD0=None,
                       skip_resync=False):
        """One Gibbs sweep over a relation's features. Deferred mode
        (caches/SD0 given + skip_resync): the frozen caches come from
        state instead of a fresh A pass, SD accumulates ACROSS
        iterations, and the per-case resync is left to the refresh —
        the corrected() algebra is already exact for any accumulated
        (s, dQB) relative to the frozen base."""
        if "rel" in _skip:
            return A, w, V, jnp.zeros((), jnp.int32), key, SD0
        wnum = dr["wnum"]  # [nb+1]
        if caches is None:
            caches = build_rel_caches(A, dr, nb, slab_meta)
        we0, _we2_0, SQ0, SQe0, SQQ0 = caches
        # s/dQB live PACKED as one [nb+1+ext, 1+k] table SD = [s | dQB]:
        # every consumer reads/writes both at the same block row, and on
        # TPU a row gather costs ~10-15 ns per ROW regardless of width,
        # so the packed layout halves the gather/scatter rows of the
        # update pass, the corrected() reads, and the 1M-row resync
        # (round 5; the split form cost ~8 ms/iter on the BS bench).
        # The dummy-row tail gives the update scatters UNIQUE ids for
        # padded entries (entry_bs); dummy rows only ever accumulate
        # exact zeros (pad x == 0) and are never read back (reads use
        # entry_b, whose pads point at the zero row nb).
        ext = max((Ep for (_, Ep) in shapes), default=1)
        SD = SD0 if SD0 is not None else jnp.zeros((nb + 1 + ext, 1 + k), f)
        n_rej = jnp.zeros((), jnp.int32)
        # symmetric QQ moment packing (same trick as the flat engine's
        # case-major stats): the x^2-weighted SQQ moment is bitwise
        # symmetric, so only the T = k(k+1)/2 upper-triangle columns are
        # accumulated and the full matrix is unpacked by gather — the
        # mirror entries are the same commutative products summed in the
        # same order, so the unpack is bit-identical
        T = k * (k + 1) // 2
        iu0_np, iu1_np = np.triu_indices(k)
        iu0 = jnp.asarray(iu0_np, jnp.int32)
        iu1 = jnp.asarray(iu1_np, jnp.int32)
        sym_np = np.zeros((k, k), np.int32)
        sym_np[iu0_np, iu1_np] = np.arange(T, dtype=np.int32)
        sym_np[iu1_np, iu0_np] = sym_np[iu0_np, iu1_np]
        sym_idx = jnp.asarray(sym_np.reshape(-1))

        for (F_pad, E_pad), st in zip(shapes, dr["stacks"]):
            nblk = st["feats"].shape[0]
            key, kz = jax.random.split(key)
            if do_sample:
                zs = jax.random.normal(kz, (nblk, F_pad, d), dtype=f)
            else:
                zs = jnp.zeros((nblk, F_pad, d), f)
            MW = T + 3 * k + 5
            # entry chunking bounds the [EC, MW] moment temp (and the
            # [EC, k, k] gathered-cache temps) at any k — both EC and
            # E_pad are powers of two, so EC divides E_pad
            EC = E_pad
            while EC > 256 and EC * MW * 4 > (96 << 20):
                EC >>= 1

            def block_step(carry, inp):
                w, V, SD, n_rej = carry
                feats, eb, ebs, ex, ef, z = inp
                theta_old = jnp.concatenate(
                    [w[feats][:, None], V[feats]], axis=1
                )  # [F_pad, d]

                def corrected(eb_c, ex_c):
                    """Per-entry corrected caches for one entry chunk."""
                    wn = wnum[eb_c]
                    sd = SD[eb_c]  # ONE [EC, 1+k] row gather for s + dQB
                    sb = sd[:, 0]
                    dq = sd[:, 1:]
                    SQ0_e = SQ0[eb_c]
                    we0_e = we0[eb_c]
                    SQ_c = SQ0_e + wn[:, None] * dq
                    we_c = we0_e + wn * sb + (SQ0_e * dq).sum(-1)
                    SQe_c = (
                        SQe0[eb_c]
                        + sb[:, None] * SQ0_e
                        + _einsum_hp("efg,eg->ef", SQQ0[eb_c], dq)
                        + dq * we_c[:, None]
                    )
                    SQQ_c = (
                        SQQ0[eb_c]
                        + _einsum_hp("ef,eg->efg", dq, SQ0_e)
                        + _einsum_hp("ef,eg->efg", SQ0_e, dq)
                        + wn[:, None, None] * _einsum_hp("ef,eg->efg", dq, dq)
                    )
                    return wn, dq, SQ_c, we_c, SQe_c, SQQ_c

                # per-feature moments (x-power weighted cache sums),
                # accumulated per entry chunk
                def mom_chunk(MOM, inp_c):
                    eb_c, ex_c, ef_c = inp_c
                    wn, _, SQ_c, we_c, SQe_c, SQQ_c = corrected(eb_c, ex_c)
                    x2 = ex_c * ex_c
                    x3 = x2 * ex_c
                    x4 = x2 * x2
                    mom_rows = jnp.concatenate(
                        [
                            x2[:, None] * SQQ_c[:, iu0, iu1],  # [EC, T]
                            x2[:, None] * SQ_c,
                            x3[:, None] * SQ_c,
                            ex_c[:, None] * SQe_c,
                            (x2 * wn)[:, None],
                            (x3 * wn)[:, None],
                            (x4 * wn)[:, None],
                            (ex_c * we_c)[:, None],
                            (x2 * we_c)[:, None],
                        ],
                        axis=-1,
                    )  # [EC, MW]
                    return MOM.at[ef_c].add(
                        mom_rows, indices_are_sorted=True
                    ), None

                if "mom" in _skip:
                    MOM = jnp.zeros((F_pad, MW), f)
                else:
                    MOM, _ = jax.lax.scan(
                        mom_chunk,
                        jnp.zeros((F_pad, MW), f),
                        (
                            eb.reshape(-1, EC),
                            ex.reshape(-1, EC),
                            ef.reshape(-1, EC),
                        ),
                    )

                # reconstruct [Qq | qa | qe | aa | ae] (v_j-free identities,
                # same as the flat engine's case-major reconstruction)
                vo = theta_old[:, 1:]  # [F_pad, k]
                M2 = MOM[:, :T][:, sym_idx]  # unpack symmetric [*, k*k]
                S2 = MOM[:, T : T + k]
                S3 = MOM[:, T + k : T + 2 * k]
                SQe_f = MOM[:, T + 2 * k : T + 3 * k]
                m2 = MOM[:, -5]
                m3 = MOM[:, -4]
                m4 = MOM[:, -3]
                mxe = MOM[:, -2]
                m2e = MOM[:, -1]
                vS3 = (vo[:, :, None] * S3[:, None, :]).reshape(F_pad, k * k)
                S3v = (S3[:, :, None] * vo[:, None, :]).reshape(F_pad, k * k)
                vv = (vo[:, :, None] * vo[:, None, :]).reshape(F_pad, k * k)
                Qq_r = M2 - vS3 - S3v + m4[:, None] * vv
                qe_r = SQe_f - m2e[:, None] * vo
                if use_linear:
                    qa_r = S2 - m3[:, None] * vo
                    aa_r = m2[:, None]
                    ae_r = mxe[:, None]
                else:
                    qa_r = jnp.zeros_like(vo)
                    aa_r = jnp.zeros((F_pad, 1), f)
                    ae_r = jnp.zeros((F_pad, 1), f)
                GG = jnp.concatenate([Qq_r, qa_r, qe_r, aa_r, ae_r], axis=-1)

                g_f = attr_group[feats]
                lam = jnp.concatenate(
                    [w_lambda_g[g_f][:, None], v_lambda_g[g_f]], axis=1
                )
                mu_pr = jnp.concatenate(
                    [w_mu_g[g_f][:, None], v_mu_g[g_f]], axis=1
                )
                if not use_linear:
                    lam = lam.at[:, 0].set(1e30)
                    mu_pr = mu_pr.at[:, 0].set(0.0)
                # padded features (feats == n) have all-zero stats; give
                # them unit prior precision so their (discarded) draw is
                # finite and never pollutes the rejection counter
                real = (feats < n)[:, None]
                lam = jnp.where(real, lam, 1.0)
                mu_pr = jnp.where(real, mu_pr, 0.0)
                if "draw" in _skip:
                    theta_new, rej = theta_old, jnp.zeros((), jnp.int32)
                elif F_pad <= 1024:
                    theta_new, rej = blocked_theta_draw(
                        GG, theta_old, lam, mu_pr, z, alpha, k, do_sample,
                        bound=draw_bound,
                    )
                else:
                    # feature-chunked draws bound the [FC, k, k] Cholesky
                    # temps (F_pad is a power of two, so 1024 divides it)
                    FC = 1024

                    def draw_chunk(_, inp_c):
                        th_c, r_c = blocked_theta_draw(
                            *inp_c, alpha, k, do_sample, bound=draw_bound
                        )
                        return None, (th_c, r_c)

                    _, (th_ch, rej_ch) = jax.lax.scan(
                        draw_chunk, None,
                        tuple(
                            x.reshape(-1, FC, x.shape[-1])
                            for x in (GG, theta_old, lam, mu_pr, z)
                        ),
                    )
                    theta_new = th_ch.reshape(F_pad, d)
                    rej = rej_ch.sum()
                delta = theta_new - theta_old

                # per-row state updates (use dQB BEFORE adding this
                # block's contribution); within a conflict-free block all
                # real entries touch DISTINCT block rows, so chunked
                # gathers never see a same-block update. Padded entries
                # have x = 0 (zero contributions to row nb).
                def upd_chunk(SD, inp_c):
                    eb_c, ebs_c, ex_c, ef_c = inp_c
                    # ONE full-row gather then slice: `x[idx, 1:]` lowers
                    # to an offset gather that runs ~7x slower on TPU
                    # than gather-then-slice (measured 3.4 vs 0.47 ms at
                    # [2048, 33]); this was the dominant cost of the
                    # whole update pass
                    dq = SD[eb_c][:, 1:]
                    de = delta[ef_c]
                    dw_e = de[:, 0]
                    dv_e = de[:, 1:]
                    v_old_e = theta_old[ef_c][:, 1:]
                    ds = ex_c * (
                        dw_e + (dv_e * (dq - ex_c[:, None] * v_old_e)).sum(-1)
                    )
                    # ebs: real entries hit distinct block rows (the
                    # partition is conflict-free) and pads hit unique
                    # dummy rows -> the scatter takes the fast path;
                    # [ds | x dv] lands as ONE packed row-add
                    SD = SD.at[ebs_c].add(
                        jnp.concatenate(
                            [ds[:, None], ex_c[:, None] * dv_e], axis=1
                        ),
                        unique_indices=True,
                    )
                    return SD, None

                if "upd" not in _skip:
                    SD, _ = jax.lax.scan(
                        upd_chunk, SD,
                        (
                            eb.reshape(-1, EC),
                            ebs.reshape(-1, EC),
                            ex.reshape(-1, EC),
                            ef.reshape(-1, EC),
                        ),
                    )

                w = w.at[feats].set(theta_new[:, 0])
                V = V.at[feats].set(theta_new[:, 1:])
                return (w, V, SD, n_rej + rej), None

            (w, V, SD, n_rej), _ = jax.lax.scan(
                block_step,
                (w, V, SD, n_rej),
                (st["feats"], st["entry_b"], st["entry_bs"], st["entry_x"],
                 st["entry_f"], zs),
            )

        # resync A: e += s[map] + dQB[map] . Q0;  Q += dQB[map]
        def resync_chunk(A, inp):
            ci, mb = inp
            A_chunk = jax.lax.dynamic_slice(A, (ci * CU, 0), (CU, 1 + k))
            sd = SD[mb]  # ONE packed row gather per case
            sg = sd[:, 0]
            dg = sd[:, 1:]
            e_new = A_chunk[:, 0] + sg + (dg * A_chunk[:, 1:]).sum(-1)
            Q_new = A_chunk[:, 1:] + dg
            A = jax.lax.dynamic_update_slice(
                A, jnp.concatenate([e_new[:, None], Q_new], axis=1),
                (ci * CU, 0),
            )
            return A, None

        if "resync" not in _skip and not skip_resync:
            nchm = dr["map_tr"].shape[0]
            A, _ = jax.lax.scan(
                resync_chunk, A,
                (jnp.arange(nchm, dtype=jnp.int32), dr["map_tr"]),
            )
            if incr_test:
                # same affine update for the test tail (pred and Q take
                # exactly the per-case e/Q deltas; test rows contribute
                # no stats, so this is the only place they cost)
                def resync_te(A, inp):
                    ci, mb = inp
                    A_chunk = jax.lax.dynamic_slice(
                        A, (TEST_OFF + ci * CU, 0), (CU, 1 + k)
                    )
                    sd = SD[mb]
                    sg = sd[:, 0]
                    dg = sd[:, 1:]
                    e_new = A_chunk[:, 0] + sg + (dg * A_chunk[:, 1:]).sum(-1)
                    Q_new = A_chunk[:, 1:] + dg
                    return jax.lax.dynamic_update_slice(
                        A, jnp.concatenate([e_new[:, None], Q_new], axis=1),
                        (TEST_OFF + ci * CU, 0),
                    ), None

                A, _ = jax.lax.scan(
                    resync_te, A,
                    (
                        jnp.arange(dr["map_te"].shape[0], dtype=jnp.int32),
                        dr["map_te"],
                    ),
                )
        return A, w, V, n_rej, key, SD

    # ---------------- one iteration ----------------
    def draw_all(state, S):
        key = state["key"]
        rej = jnp.zeros((), jnp.int32)
        A = state["A"]
        SD_def = state.get("SD")

        key, k1 = jax.random.split(key)
        if deferred:
            from libfm_tpu.learners.mcmc import draw_alpha_from_sum

            sum_e, sum_e2 = _deferred_sums(
                state["relc"], SD_def, S["dev_rels"][0]["wnum"], REL_NB[0]
            )
            alpha, r = draw_alpha_from_sum(
                k1, sum_e2, nc_train, state["alpha"], alpha_0, gamma_0,
                do_multilevel, do_sample,
            )
        else:
            e = A[:nc_train, 0]
            alpha, r = draw_alpha(
                k1, e, nc_train, state["alpha"], alpha_0, gamma_0,
                do_multilevel, do_sample,
            )
        rej += r

        w0 = state["w0"]
        if use_bias and "alphaw0" not in _skip:
            key, k1 = jax.random.split(key)
            acc = (sum_e if deferred else jnp.sum(e)) - nc_train * w0
            sigma_sqr = 1.0 / (learner.reg0 + alpha * nc_train)
            mean = -sigma_sqr * (alpha * acc - learner.w0_mean_0 * learner.reg0)
            prop = (
                samplers.gaussian(k1, mean, jnp.sqrt(sigma_sqr))
                if do_sample else mean
            )
            w0_new, r = samplers.finite_or(prop, w0, bound=draw_bound)
            rej += r
            if deferred:
                # every case maps to exactly one block row of the single
                # relation: folding the bias delta into the REAL rows'
                # s-column moves every e by the same constant (the
                # sentinel row stays zero; pad entries read it but have
                # x = 0, so their stats stay exact zeros)
                SD_def = SD_def.at[: REL_NB[0], 0].add(w0_new - w0)
            else:
                A = A.at[:nc_train, 0].add(w0_new - w0)
                if incr_test:
                    # the incremental test tail holds pred, which moves
                    # by the same bias delta
                    A = A.at[TEST_OFF : TEST_OFF + nc_test, 0].add(
                        w0_new - w0
                    )
            w0 = w0_new

        w, V = state["w"], state["V"]
        w_mu, w_lambda = state["w_mu"], state["w_lambda"]
        v_mu, v_lambda = state["v_mu"], state["v_lambda"]
        if do_multilevel and "hyper" not in _skip:
            if use_linear:
                key, k1 = jax.random.split(key)
                w_lambda, w_mu, r = draw_theta_hyperpriors(
                    k1, w, S["attr_group"], S["num_attr_per_group"],
                    w_mu, w_lambda, alpha_0, gamma_0, beta_0, mu_0,
                    do_sample, valid=S["valid"],
                )
                rej += r
            if k > 0:
                key, k1 = jax.random.split(key)
                V_s = V * S["valid"][:, None]
                sum_v = seg_sum(V_s, S["attr_group"], G, sorted_ids=False)
                dev = (V - v_mu[S["attr_group"]]) * S["valid"][:, None]
                lam_gamma = (
                    beta_0 * (v_mu - mu_0) ** 2 + gamma_0
                    + seg_sum(dev * dev, S["attr_group"], G, sorted_ids=False)
                )
                lam_alpha = alpha_0 + S["num_attr_per_group"][:, None] + 1.0
                ka, kb = jax.random.split(k1)
                lam_prop = (
                    samplers.gamma(ka, lam_alpha / 2.0, lam_gamma / 2.0)
                    if do_sample else lam_alpha / lam_gamma
                )
                v_lambda, r1 = samplers.finite_or(lam_prop, v_lambda)
                mu_mean = (sum_v + beta_0 * mu_0) / (
                    S["num_attr_per_group"][:, None] + beta_0
                )
                mu_sigma_sqr = 1.0 / (
                    (S["num_attr_per_group"][:, None] + beta_0) * v_lambda
                )
                mu_prop = (
                    samplers.gaussian(kb, mu_mean, jnp.sqrt(mu_sigma_sqr))
                    if do_sample else mu_mean
                )
                v_mu, r2 = samplers.finite_or(mu_prop, v_mu)
                rej += r1 + r2
        else:
            w_mu = jnp.full_like(w_mu, mu_0)
            v_mu = jnp.full_like(v_mu, mu_0)

        for F_m, blk in zip(MAIN_F, S["main_dev"]):
            A, w, V, r, key = sweep_main_block(
                A, w, V, blk, F_m, alpha, w_mu, w_lambda, v_mu, v_lambda, key
            )
            rej += r
        for nb_r, shp, slm, dr in zip(
            REL_NB, REL_SHAPES, REL_SLAB_META, S["dev_rels"]
        ):
            A, w, V, r, key, SD_out = sweep_relation(
                A, w, V, dr, nb_r, shp, slm, alpha, w_mu, w_lambda, v_mu,
                v_lambda, key,
                caches=state["relc"] if deferred else None,
                SD0=SD_def if deferred else None,
                skip_resync=deferred,
            )
            if deferred:
                SD_def = SD_out
            rej += r

        if n_unobs and "unobs" not in _skip:
            key, ku = jax.random.split(key)
            g_u = S["attr_group"][S["unobserved"]]
            if do_sample:
                kuw, kuv = jax.random.split(ku)
                w_u = samplers.gaussian(
                    kuw, w_mu[g_u], jnp.sqrt(1.0 / w_lambda[g_u])
                )
                v_u = samplers.gaussian(
                    kuv, v_mu[g_u], jnp.sqrt(1.0 / v_lambda[g_u])
                )
            else:
                w_u = w_mu[g_u]
                v_u = v_mu[g_u] + jnp.zeros((n_unobs, k), f)
            w_u, r1 = samplers.finite_or(
                w_u, w[S["unobserved"]], bound=draw_bound
            )
            v_u, r2 = samplers.finite_or(
                v_u, V[S["unobserved"]], bound=draw_bound
            )
            rej += r1 + r2
            if use_linear:
                w = w.at[S["unobserved"]].set(w_u, unique_indices=True)
            V = V.at[S["unobserved"]].set(v_u, unique_indices=True)

        out = dict(
            state, A=A, w0=w0, w=w, V=V, alpha=alpha,
            w_mu=w_mu, w_lambda=w_lambda, v_mu=v_mu, v_lambda=v_lambda,
            key=key, rejected=rej,
        )
        if deferred:
            out["SD"] = SD_def
        return out

    from functools import partial

    def one_step(state, it, S, refresh=True):
        state = draw_all(state, S)
        # one set of per-relation block scores serves both the test
        # prediction and the train refresh (same w, V)
        scores = _rel_scores(state["w"], state["V"], S)
        if deferred:
            # test predictions: refresh-frozen [pred0 | Q0] tail + the
            # accumulated SD corrections (one SD gather per test case —
            # the only per-case work of a deferred fast iteration)
            SD_now = state["SD"]
            map_te = S["dev_rels"][0]["map_te"]

            def _te_chunk(_, inp):
                ci, mb = inp
                A_chunk = jax.lax.dynamic_slice(
                    state["A"], (TEST_OFF + ci * CU, 0), (CU, 1 + k)
                )
                sd = SD_now[mb]
                return None, (
                    A_chunk[:, 0] + sd[:, 0]
                    + (sd[:, 1:] * A_chunk[:, 1:]).sum(-1)
                )

            _, preds = jax.lax.scan(
                _te_chunk, None,
                (jnp.arange(map_te.shape[0], dtype=jnp.int32), map_te),
            )
            pred_test = preds.reshape(-1)[:nc_test]
        else:
            pred_test = predict_test(state["w0"], state["w"], state["V"],
                                     S, scores=scores, A=state["A"])
        key = state["key"]
        key, kr = jax.random.split(key)
        latent = state.get("latent")
        if "refresh" in _skip or ("trainmetric" in _skip and not refresh):
            A, train_metric = state["A"], jnp.zeros((), f)
        elif refresh:
            A, train_metric, latent = refresh_A_and_train_metric(
                state["w0"], state["w"], state["V"], kr, S, state["A"],
                scores=scores,
            )
            if deferred:
                # re-ground the deferred state on the fresh A: rebuild
                # the frozen block-row caches, zero the accumulated SD
                state = dict(
                    state,
                    relc=build_rel_caches(
                        A, S["dev_rels"][0], REL_NB[0], REL_SLAB_META[0]
                    ),
                    SD=jnp.zeros_like(state["SD"]),
                )
        elif task != TASK_REGRESSION:
            # classification fast path (refresh_every > 1): same
            # persistent-probit-latent scheme as the flat engine
            # (mcmc_vector.py round 4) — pred = e + latent is exact up
            # to drift because the sweeps' resync maintains e for the
            # latents the draws conditioned on; resample elementwise,
            # fold the delta into the e column.
            A = state["A"]
            y_ch = S["y_tr_ch"]
            m_ch = S["mask_tr_ch"]
            nchunk_, C_ = y_ch.shape
            e_flat = jax.lax.dynamic_slice_in_dim(A[:, 0], 0, nchunk_ * C_)
            pred_ch = e_flat.reshape(nchunk_, C_) + latent
            pp = samplers.cdf_gaussian(pred_ch)
            correct = ((pp >= 0.5) & (y_ch > 0.0)) | (
                (pp < 0.5) & (y_ch < 0.0)
            )
            cnt = jnp.maximum(m_ch.sum(), 1.0)
            train_metric = (correct.astype(f) * m_ch).sum() / cnt
            ckeys = jax.random.split(kr, nchunk_)
            if do_sample:
                lat_pos = jax.vmap(
                    lambda ck_, p_: samplers.left_truncated_gaussian(
                        ck_, 0.0, p_, 1.0
                    )
                )(ckeys, pred_ch)
                lat_neg = jax.vmap(
                    lambda ck_, p_: samplers.right_truncated_gaussian(
                        ck_, 0.0, p_, 1.0
                    )
                )(ckeys, pred_ch)
            else:
                lat_pos = samplers.left_tn_expectation(pred_ch)
                lat_neg = samplers.right_tn_expectation(pred_ch)
            lat_new = jnp.where(y_ch >= 0.0, lat_pos, lat_neg) * m_ch
            e_new = (pred_ch - lat_new) * m_ch
            A = A.at[: nchunk_ * C_, 0].set(e_new.reshape(-1))
            latent = lat_new
        elif deferred:
            # deferred fast path: the train metric comes from the
            # closed-form e^2 sum over block rows — no per-case pass.
            # (Reported WITHOUT the target clamp, which binds only for
            # out-of-range predictions; refresh iterations report the
            # exact clamped metric. Diagnostic only — test metrics are
            # per-case and exact.)
            A = state["A"]
            _, sum_e2_now = _deferred_sums(
                state["relc"], state["SD"], S["dev_rels"][0]["wnum"],
                REL_NB[0],
            )
            train_metric = jnp.sqrt(
                jnp.maximum(sum_e2_now, 0.0) / max(nc_train, 1)
            )
        else:
            # regression fast path (refresh_every > 1): the sweeps'
            # resync pass maintains A = [e | Q] incrementally and
            # exactly (up to float drift, killed by the periodic
            # refresh — fm_learn_mcmc_simultaneous.h:123-124); the
            # train metric comes straight from e = pred - y.
            A = state["A"]
            y_flat = S["y_tr_ch"].reshape(-1)
            m_flat = S["mask_tr_ch"].reshape(-1)
            e = jax.lax.dynamic_slice_in_dim(A[:, 0], 0, y_flat.shape[0])
            pred_tr = e + y_flat
            err = (jnp.clip(pred_tr, min_t, max_t) - y_flat) * m_flat
            cnt = jnp.maximum(m_flat.sum(), 1.0)
            train_metric = jnp.sqrt((err * err).sum() / cnt)
        if task == TASK_REGRESSION:
            pred_this = pred_test
            p_clamped = jnp.clip(pred_test, min_t, max_t)
            pred_sum_all = state["pred_sum_all"] + p_clamped
            pred_sum_all_but5 = state["pred_sum_all_but5"] + jnp.where(
                it >= 5, p_clamped, 0.0
            )
        else:
            p_test = samplers.cdf_gaussian(pred_test)
            pred_this = p_test
            pred_sum_all = state["pred_sum_all"] + p_test
            pred_sum_all_but5 = state["pred_sum_all_but5"] + jnp.where(
                it >= 5, p_test, 0.0
            )

        n_all = it + 1.0
        n_but5 = jnp.maximum(it - 4.0, 1e-12)
        if "metrics" in _skip:
            z = jnp.zeros((), f)
            m_this = m_all = m_but5 = (z, z)
        elif task == TASK_REGRESSION:
            m_this = _masked_rmse_mae(
                pred_this, y_test, S["eval_mask"], min_t, max_t, 1.0
            )
            m_all = _masked_rmse_mae(
                pred_sum_all, y_test, S["eval_mask"], min_t, max_t, 1.0 / n_all
            )
            m_but5 = _masked_rmse_mae(
                pred_sum_all_but5, y_test, S["eval_mask"], min_t, max_t,
                1.0 / n_but5,
            )
        else:
            m_this = _masked_acc_ll(pred_this, y_test, S["eval_mask"], 1.0)
            m_all = _masked_acc_ll(
                pred_sum_all, y_test, S["eval_mask"], 1.0 / n_all
            )
            m_but5 = _masked_acc_ll(
                pred_sum_all_but5, y_test, S["eval_mask"], 1.0 / n_but5
            )

        new_state = dict(
            state, A=A, pred_this=pred_this, pred_sum_all=pred_sum_all,
            pred_sum_all_but5=pred_sum_all_but5, key=key,
        )
        # classification only: the regression state must never gain the
        # latent key mid-run (state pytree stability — mcmc_vector.py)
        if task != TASK_REGRESSION and latent is not None:
            new_state["latent"] = latent
        metrics = dict(
            train=train_metric, this=m_this, all=m_all, but5=m_but5,
            alpha=state["alpha"], rejected=state["rejected"],
            w_mu=state["w_mu"], w_lambda=state["w_lambda"],
            v_mu=state["v_mu"], v_lambda=state["v_lambda"],
        )
        if task != TASK_REGRESSION:
            metrics["auc"] = _masked_auc(pred_sum_all, y_test, S["eval_mask"])
        return new_state, metrics

    @partial(jax.jit, donate_argnums=(0,))
    def run_chunk(state, its, S):
        """One dispatch per chunk: scan the fast steps, then the refresh
        step (its[-1] is a refresh point — mcmc.dispatch_chunks). The
        ~28 ms per-dispatch tunnel round-trip amortizes over the chunk
        (studies/results/asyncdisp_r5.json); per-step metrics return
        stacked [L, …]."""
        L = its.shape[0]
        if L > 1:
            state, ms = jax.lax.scan(
                lambda st, it_: one_step(st, it_, S, False), state, its[:-1]
            )
        state, m_last = one_step(state, its[-1], S, True)
        if L > 1:
            return state, jax.tree.map(
                lambda a, b: jnp.concatenate([a, b[None]], axis=0),
                ms, m_last,
            )
        return state, jax.tree.map(lambda b: b[None], m_last)

    # ---------------- init & loop ----------------
    @jax.jit
    def init_A(w0_0, w, V, key, S):
        A0, _, lat0 = refresh_A_and_train_metric(
            w0_0, w, V, key, S,
            jnp.zeros((A_rows, 1 + k), f), init=True,
        )
        return A0, lat0

    key, k_init = jax.random.split(key)
    A0, lat0 = init_A(w0_init, w, V, k_init, statics)
    state = dict(
        A=A0, w0=w0_init, w=w, V=V,
        alpha=jnp.asarray(1.0, f),
        w_mu=jnp.zeros((G,), f), w_lambda=w_lambda,
        v_mu=jnp.zeros((G, k), f), v_lambda=v_lambda,
        pred_this=jnp.zeros((nc_test,), f),
        pred_sum_all=jnp.zeros((nc_test,), f),
        pred_sum_all_but5=jnp.zeros((nc_test,), f),
        key=key, rejected=jnp.zeros((), jnp.int32),
    )
    if task != TASK_REGRESSION:
        # probit latents (classification fast path; checkpointed state)
        state["latent"] = lat0
    if deferred:
        # frozen block-row caches + cross-iteration SD (checkpointed
        # with the rest of the sampler state; a checkpoint written by
        # the non-deferred engine has a different tree and restores
        # fresh — _maybe_restore's structure check)
        state["relc"] = build_rel_caches(
            A0, statics["dev_rels"][0], REL_NB[0], REL_SLAB_META[0]
        )
        state["SD"] = jnp.zeros((REL_NB[0] + 1 + _ext0, 1 + k), f)

    learner.history = []
    start_iter = 0
    if learner.checkpoint_path:
        state, start_iter = learner._maybe_restore(state)
    if mesh is not None:
        # restore precedes the sharded placement (host leaves from a
        # checkpoint land with the same plan as a fresh init)
        state["A"] = jax.device_put(state["A"], sh_A)
        state["w"] = jax.device_put(state["w"], sh_model1)
        state["V"] = jax.device_put(state["V"], sh_model2)
    # same cadence as the flat engine (mcmc_vector.py): chunked
    # dispatch whose last step is a refresh point — the drift-control
    # refresh runs only at cadence points, and the first iteration
    # after a (re)start is its own single-step chunk (compiles land in
    # the warm-up window, a restored A re-grounds immediately)
    from libfm_tpu.learners.mcmc import dispatch_chunks

    ckpt_every = (
        learner.checkpoint_every
        if (learner.checkpoint_path and learner.checkpoint_every)
        else 0
    )
    for i0, L in dispatch_chunks(
        start_iter, learner.num_iter,
        getattr(learner, "refresh_every", 1), ckpt_every,
    ):
        its = jnp.arange(i0, i0 + L, dtype=jnp.float32)
        c0 = iter_clocks()
        state, ms = run_chunk(state, its, statics)
        jax.block_until_ready(state["A"])
        c1 = iter_clocks()
        per = tuple((b - a) / L for a, b in zip(c0, c1))
        need = {"train", "this", "all", "but5", "alpha", "rejected", "auc"}
        if learner.rlog is not None:
            need |= {"w_mu", "w_lambda", "v_mu", "v_lambda"}
        ms_host = jax.device_get(
            {k_: v_ for k_, v_ in ms.items() if k_ in need}
        )
        for j in range(L):
            learner._log_iteration(
                i0 + j, jax.tree.map(lambda x: x[j], ms_host), per
            )
        if ckpt_every and (i0 + L) % ckpt_every == 0:
            learner._save_checkpoint(state, i0 + L)

    # keep the parameter-table state for introspection but NOT the big
    # per-case A table (see mcmc_vector.py) — record its sharding evidence
    learner._vector_state = {k_: v_ for k_, v_ in state.items() if k_ != "A"}
    learner._vector_state["A_shape"] = state["A"].shape
    learner._vector_state["A_shard_shapes"] = {
        s.data.shape for s in state["A"].addressable_shards
    }
    learner._final_state = MCMCState(
        w0=state["w0"], w=state["w"][:n], vt=state["V"][:n].T,
        alpha=state["alpha"], w_mu=state["w_mu"],
        w_lambda=state["w_lambda"], v_mu=state["v_mu"],
        v_lambda=state["v_lambda"], e=state["A"][:nc_train, 0],
        pred_this=state["pred_this"], pred_sum_all=state["pred_sum_all"],
        pred_sum_all_but5=state["pred_sum_all_but5"], key=state["key"],
        rejected=state["rejected"],
    )
    return learner.history

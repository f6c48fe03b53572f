"""Vector-sweep MCMC/ALS engine — the TPU fast path.

Draws each feature's whole parameter vector theta_j = (w_j, v_j1..v_jk)
jointly from its exact Gaussian conditional, one conflict-free block at a
time (blocked Gibbs; with do_sample=False it is vector-wise block
coordinate descent, the classic ALS-MF solve). Compared with the
reference's scalar sweep (/root/reference/src/libfm/src/fm_learn_mcmc.h:
430-641, one coordinate at a time with O(k) cache passes), this engine:

- keeps ONE device array A = [e | Q] (residual + per-factor linear
  caches, [num_rows + SLOT_BUDGET, 1+k]; the tail rows are zero dummy
  targets for padding slots, each with a UNIQUE id so scatters stay on
  the unique-indices fast path);
- per block: one chunked row-gather pass of A over the static bucketed
  slot layout (data/vector_layout.py) accumulating every feature's
  sufficient statistics H^T H, H^T e with batched MXU matmuls, batched
  Cholesky draws of all theta_j (feature-chunked), and one chunked
  gather+scatter pass applying the e/Q updates — every unbounded temp
  lives inside a lax.scan chunk, so HBM stays bounded at any scale;
- each iteration rebuilds A in place (dynamic_update_slice under a
  donated scan carry) while computing train metrics, and computes test
  predictions from one chunked row-gather of the packed parameter table
  [w | V] over the padded [num_rows, L] case layout.

Because features inside a conflict-free block share no training rows,
drawing them in parallel from the block snapshot is EXACTLY the
sequential block scan. The joint vector draw is a different (coarser)
Gibbs blocking than the reference's per-coordinate scan — same
stationary distribution, usually better mixing per sweep; ALS converges
at least as fast per sweep (exact block minimisation). Validated against
the reference binary in tests/test_mcmc_vector.py.

Why this shape: on TPU every gather/scatter/segment op costs ~10-15ns
per ROW regardless of row width (<=256B), so the scalar engine's O(k)
row passes per sweep are latency-bound; this engine does O(1) row passes
per block and puts the O(E*k^2) math on the MXU where it is effectively
free (measurements in BENCHNOTES.md).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from libfm_tpu.data.batching import conflict_free_blocks
from libfm_tpu.data.dataset import Dataset
from libfm_tpu.data.vector_layout import (
    build_block_layout,
    padded_rows_layout,
)
from libfm_tpu.learners.mcmc import (
    MCMCLearner,
    draw_alpha,
    draw_theta_hyperpriors,
    _masked_rmse_mae,
    _masked_acc_ll,
)
from libfm_tpu.ops import samplers
from libfm_tpu.ops.lane_chol import (
    cho_solve_lanes,
    cholesky_lanes,
    solve_lower_lanes,
    solve_upper_lanes,
)
from libfm_tpu.ops.segment import seg_sum
from libfm_tpu.tasks import TASK_REGRESSION
from libfm_tpu.utils.timers import iter_clocks


from dataclasses import dataclass


@jax.tree_util.register_pytree_node_class
@dataclass
class DevBucket:
    """Device copy of one width bucket; `width` is static (pytree aux).

    `seg_feat` is the block-local feature id (used by the update pass and
    the dual draws); `seg_feat2` is the DENSE-LOCAL remapped id used when
    accumulating this bucket's stats into the dense GG (equal to seg_feat
    for dual buckets, where it is unused)."""

    slot_case: jax.Array
    slot_val: jax.Array
    seg_feat: jax.Array
    seg_feat2: jax.Array
    width: int
    # Case-sorted slab form (BENCHNOTES "Gather cost vs table size"):
    # each scan step covers ONE `slab`-case window of A starting at
    # slab_start[step]; slot_case is then SLAB-RELATIVE and the pass
    # gathers from a dynamic_slice of A instead of the full table.
    slab_start: jax.Array | None = None
    slab: int = 0
    # one segment per feature in feature order (unique_feats layouts):
    # per-chunk stats rows are contiguous GG rows [i*C, (i+1)*C) — the
    # engine stores them with dynamic_update_slice instead of the
    # fat-row scatter-add (0.51 s/iter of the ML-10M headline)
    slice_store: bool = False
    # dual buckets only (round 5): every segment in this bucket has at
    # most `dual_c` REAL slots (zipf tails make count<=2 ~60% of dual
    # features at config #5's shape) — the Woodbury gram/Cholesky runs
    # on the [:, :dual_c] slot window instead of the full W (measured
    # ceiling 0.82 s/iter on config #5,
    # studies/results/lv_dual_probe_r5.json). 0 = full width.
    dual_c: int = 0
    # (a round-4 "segment-combine" stats store lived here — per-chunk
    # one-hot reduction onto a local feature window before the GG
    # write. Removed round 5: measured NEUTRAL on its designed config
    # (#5 zipf head features, 5.7023 vs 5.7033 s/iter,
    # studies/results/segcomb.json) — the residual scatter lives in the
    # low-multiplicity W=32 bucket it cannot help.)

    def tree_flatten(self):
        return (
            self.slot_case, self.slot_val, self.seg_feat, self.seg_feat2,
            self.slab_start,
        ), (self.width, self.slab, self.slice_store, self.dual_c)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(
            *children[:4], width=aux[0], slab_start=children[4],
            slab=aux[1], slice_store=aux[2], dual_c=aux[3],
        )


@jax.tree_util.register_pytree_node_class
@dataclass
class DevLayout:
    """Device copy of one block layout; `F`/`F_dense` are static (aux).

    `buckets` hold segments whose features need the dense d x d draw;
    `dual_buckets` hold whole-feature segments drawn through the dual
    (Woodbury) c x c system; `dense_feats` lists the block-local ids of
    the dense features (the GG stats array is sized by them)."""

    features: jax.Array
    groups: jax.Array
    buckets: list
    dual_buckets: list
    dense_feats: jax.Array
    F: int
    F_dense: int
    # case-major dense update layout ([nch, CU] chunks of the per-case
    # block-local feature id / value; None for low-coverage blocks).
    # A conflict-free block touches each case AT MOST ONCE, so its e/Q
    # update can be applied as dense chunk reads + dynamic_update_slice
    # writes instead of a row scatter — measured 3-5x cheaper on TPU
    # (the A-scatter was the dominant per-block cost, BENCHNOTES.md).
    up_col: jax.Array | None = None
    up_val: jax.Array | None = None
    # [nch, 8192] per-case DENSE-remapped feature id (dual/sentinel
    # cases out of range), precomputed host-side; drives the case-major
    # one-hot moment-matmul stats for small-F blocks (None = ineligible)
    stats_map: jax.Array | None = None
    # incremental-test-tail update chunks (round 5): per TEST case, the
    # block-local feature id / value ([nch_te, CU]; None when the tail
    # is disabled). Test rows consume the same per-feature deltas as
    # train rows but contribute no stats — the per-iteration test
    # P-gather disappears (measured ceiling 48 ms/iter on the ML-10M
    # headline, studies/results/flat_pred_probe_r5.json).
    te_col: jax.Array | None = None
    te_val: jax.Array | None = None

    def tree_flatten(self):
        return (
            self.features, self.groups, self.buckets, self.dual_buckets,
            self.dense_feats, self.up_col, self.up_val, self.stats_map,
            self.te_col, self.te_val,
        ), (self.F, self.F_dense)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(
            *children[:5], up_col=children[5], up_val=children[6],
            stats_map=children[7], te_col=children[8], te_val=children[9],
            F=aux[0], F_dense=aux[1],
        )


class MCMCVectorLearner(MCMCLearner):
    """MCMC/ALS with joint (w_j, v_j) vector draws (TPU fast path).

    Pass `mesh` (a Mesh with a 'data' axis) for data-parallel sweeps:
    the static slot layouts are sharded over segments, model state stays
    replicated, and XLA's SPMD partitioner turns the per-feature
    sufficient-statistic reductions and the A-scatter into psums over
    the data axis. tests/test_sharding.py asserts sharded == single
    device."""

    ALS_DEFAULT_REFRESH = 8

    def __init__(self, *args, widths=(32, 256), mesh=None,
                 dual_draws=True, dense_update=True, refresh_every=None,
                 **kwargs):
        super().__init__(*args, **kwargs)
        # width buckets: measured on v5e, narrow (W=8) segment gathers
        # run ~80 ns/row vs ~sub-ns/row for W>=32, so padding small
        # features up to 32 slots beats a tight W=8 bucket by ~2x per
        # sweep (ML k=64: 1.64 -> 0.83 s/iter; CTR k=16: 0.55 -> 0.44)
        self.widths = widths
        self.mesh = mesh
        # dual_draws: draw whole-feature segments through the c x c
        # Woodbury system instead of the dense d x d one (identical
        # distribution; large win when most features have few entries)
        self.dual_draws = dual_draws
        # dense_update: apply each block's e/Q delta with case-major
        # dense chunk writes instead of a row scatter (identical math;
        # the scatter was the dominant per-block cost — BENCHNOTES.md)
        self.dense_update = dense_update
        # refresh_every=R (regression only): re-predict the train set
        # every R-th iteration instead of every iteration — the sweeps
        # maintain the [e|Q] caches exactly (the sampled draws are part
        # of the incremental updates), so the refresh only clears float
        # drift (the reference's own comment,
        # fm_learn_mcmc_simultaneous.h:123-124). Classification keeps a
        # persistent probit-latent vector so the per-iteration latent
        # resample runs on pred = e + latent without re-gathering P
        # (round 4; same drift argument, tested in
        # tests/test_mcmc_vector.py). Default (None):
        # ALS_DEFAULT_REFRESH for every run — sampled or not, the chain
        # with R>1 is the same chain up to f32 drift.
        if refresh_every is None:
            refresh_every = self.ALS_DEFAULT_REFRESH
        self.refresh_every = refresh_every
        # profiling-only: trace-time phase skips inside sweep_block
        # ({"stats", "draw", "update"}); wrong results, real timings
        self._skip_phases = frozenset()
        # experiment: bf16 inputs (f32 accumulate) for the slot-path
        # stats outer products — see the einsum site for the rationale
        self._stats_bf16 = False
        # slots gathered per scan step (chunking of the slot/dual
        # passes); experiments only
        self._slot_budget = 1 << 18
        # profiling-only: "slice" replaces the stats GG scatter with a
        # contiguous write (wrong results, real timings)
        self._stats_store = "scatter"
        # relational (BS) routing knobs: joins whose materialisation is
        # <= expand_max_ratio x the BS form run flat on the expansion;
        # fatter joins use the BS vector engine (mcmc_rel_vector.py)
        # unless bs_vector=False (exact per-factor BS engine instead)
        self.expand_max_ratio = 8.0
        self.bs_vector = True
        # case-major moment stats for small-F dense blocks (BENCHNOTES
        # "Case-major moment stats"); off -> always use the slot path
        # (same statistic, different summation order — parity-tested)
        self.case_major_stats = True
        # dense-draw scan chunk (features per batched-Cholesky step)
        self._fc_chunk = 1024
        # case-major dense-update/stats chunk (cases per scan step;
        # bounds the [CU, 1+k] slice temps)
        self._cu_chunk = 1 << 17
        # Case reordering + slab gathers (VERDICT r4 item 4): sort TRAIN
        # cases by the dominant block's feature and gather its stats
        # from dynamic_slice'd windows of A. Measured on the ML-10M
        # headline (studies/headline_reorder.py): the REORDER itself is
        # free (1.4401 vs 1.4434 s/iter) but buys nothing — big-table
        # gather cost is index-pattern-independent — and the slab scan
        # REGRESSED to 2.46 s/iter because its 3.6x more scan steps each
        # paid the fat-row GG scatter's fixed cost. The real fix was
        # eliminating that scatter via whole-feature segments + slice
        # writes (vector_layout.py, 1.44 -> 0.88 s/iter), after which
        # slabs would need slice-compatible GG row continuity to help
        # further (~0.09 s bound). Default OFF; machinery retained for
        # experiments, parity-tested with forced flags.
        self.case_reorder = False
        self.case_reorder_min_bytes = 128 << 20
        # slab window (cases) for the slab-partitioned gathers; None =
        # auto (~16 MB of A rows)
        self.slab_cases = None

    # ---------------------------------------------------- case reorder
    def _maybe_reorder_cases(self, train):
        """Sort train cases by the dominant conflict-free block's feature
        so that block's features own contiguous case ranges (the slab
        gather precondition). Returns (train, sorted_feat0) where
        sorted_feat0 is the global id of the sorted block's first feature
        (None = not reordered). Pure host-side preprocessing: the
        permutation is deterministic from the data, so checkpoints
        resume consistently, and every per-case metric is a sum —
        invariant under the permutation."""
        if not self.case_reorder or self.mesh is not None:
            return train, None
        if not hasattr(train, "indptr"):  # streaming: windows are fixed
            return train, None
        nc = train.num_rows
        k = self.cfg.num_factors
        itemsize = jnp.dtype(self.dtype).itemsize
        if (nc + 1) * (1 + k) * itemsize < self.case_reorder_min_bytes:
            return train, None  # A gathers chip-resident already
        from libfm_tpu.data.batching import conflict_free_blocks

        attr_group = self.attr_group_np
        if attr_group is None:
            attr_group = np.zeros(self.cfg.num_features, dtype=np.int32)
        blocks = conflict_free_blocks(train, attr_group=attr_group)
        if not blocks:
            return train, None
        sizes = [len(b.entry_rows) for b in blocks]
        bi = int(np.argmax(sizes))
        dom = blocks[bi]
        if sizes[bi] < 0.25 * sum(sizes):
            return train, None  # no dominant block: reorder buys little
        # the dominant block must be on the slot path for slabs to help
        # (mirror the case-major eligibility bound used at devicization)
        T = k * (k + 1) // 2
        MW = T + 3 * k + 5
        Fd = len(dom.features)
        if (
            self.case_major_stats
            and Fd * MW <= 8_000_000
            and float(Fd) * MW * nc <= 2e13
        ):
            return train, None
        key = np.full(nc, np.iinfo(np.int64).max, dtype=np.int64)
        key[dom.entry_rows] = dom.entry_feat
        perm = np.argsort(key, kind="stable")
        if self.verbose:
            print(
                f"case reorder: sorting {nc} cases by block {bi} "
                f"({Fd} features, {sizes[bi]} slots) for slab gathers"
            )
        self._case_reordered = True  # observability (tests/doctoring)
        if np.array_equal(perm, np.arange(nc)):
            return train, int(dom.features[0])  # already sorted
        return train.permuted(perm), int(dom.features[0])

    # ----------------------------------------------------------- layout
    def _build_vector_layouts(self, train):
        """(layout_iter, attr_group): lazily yields one VectorBlockLayout
        per conflict-free block so learn() can devicize and free each
        before the next is built (peak host RSS = one block, not the
        whole layout set).

        For a `StreamingDataset` train (binary .x/.y pair) the blocks
        stream from the transposed `<x_path>t` file — the reference's
        out-of-core MCMC path, which reads its transpose from the .xt
        data_t file (/root/reference/src/libfm/libfm.cpp:141-174) — so
        the full CSC is never resident either."""
        attr_group = self.attr_group_np
        if attr_group is None:
            attr_group = np.zeros(self.cfg.num_features, dtype=np.int32)

        from libfm_tpu.data.streaming import StreamingDataset

        if isinstance(train, StreamingDataset):
            import os

            from libfm_tpu.data.streaming import (
                infer_position_groups,
                stream_feature_blocks,
            )

            xt = train.x_path + "t"
            if not os.path.exists(xt):
                raise ValueError(
                    f"streaming MCMC/ALS needs the transposed design "
                    f"matrix at {xt} (build it with tools/transpose.py)"
                )
            part = None
            if int(attr_group.max()) > 0:
                part = attr_group
            else:
                part = infer_position_groups(
                    train.x_path, self.cfg.num_features, train.entry_budget
                )
            if part is not None:
                def _block_iter():
                    return stream_feature_blocks(
                        xt, part, train.num_rows, train.entry_budget
                    )
            else:
                # unstructured data, no -meta: greedy first-fit partition
                # built out-of-core from the streamed transpose, then
                # wave-bounded multi-pass block collection (the streamed
                # analog of conflict_free_blocks' greedy path)
                from libfm_tpu.data.streaming import (
                    stream_feature_blocks_any,
                    stream_greedy_partition,
                )

                gpart, gcounts = stream_greedy_partition(
                    xt, train.num_rows, train.entry_budget
                )

                def _block_iter():
                    return stream_feature_blocks_any(
                        xt, gpart, train.num_rows, train.entry_budget,
                        entries_per_feature=gcounts,
                    )

            def _gen_stream():
                for b in _block_iter():
                    yield build_block_layout(
                        b.features, b.entry_rows, b.entry_vals,
                        b.entry_feat, attr_group[b.features],
                        train.num_rows, self.widths,
                    )

            return _gen_stream(), attr_group

        def _gen_mem():
            blocks = conflict_free_blocks(train, attr_group=attr_group)
            while blocks:  # pop so each block's entries free after use
                b = blocks.pop(0)
                yield build_block_layout(
                    b.features, b.entry_rows, b.entry_vals, b.entry_feat,
                    attr_group[b.features], train.num_rows, self.widths,
                )

        return _gen_mem(), attr_group

    # ------------------------------------------------------------ learn
    def learn(self, train, test: Dataset):
        """train: a Dataset, or a StreamingDataset (binary .x/.y with the
        transposed .xt alongside) for a bounded-host-RSS layout build."""
        from libfm_tpu.learners import base as _base

        _base.check_num_features(self.cfg, train, test)
        if getattr(train, "relations", None):
            # Block-structure (BS) data: when the materialised join is
            # about as large as the BS representation itself (one-hot /
            # thin relation blocks — the recommender case), expand it
            # and run this engine's vector sweeps on the flat view —
            # statistically identical, and the batched joint draws beat
            # the per-factor BS cache algorithm by ~an order of
            # magnitude on TPU (BENCHNOTES "Relational (BS)"). Fat
            # blocks, where the reference's dedup algebra genuinely
            # pays (VLDB'13), stay on the exact BS engine.
            from libfm_tpu.data.relation import expand_join, expansion_cost

            exp_nnz, bs_nnz = expansion_cost(train)
            exp_nnz_te, bs_nnz_te = expansion_cost(test)
            # block tables shared between train and test joins (the CLI
            # always shares them, relation.h:192-195 semantics) must not
            # be double-counted in the BS footprint
            shared_nnz = sum(
                jte.data.nnz
                for jte in test.relations
                if any(jte.data is jtr.data for jtr in train.relations)
            )
            bs_total = bs_nnz + bs_nnz_te - shared_nnz
            # gate: measured crossover on this chip is ~17x (BENCHNOTES
            # "Relational (BS) fast path" — at 13.5x expansion the flat
            # sweep still beat the BS algebra 1.43 vs 1.70 s/iter); 8x
            # leaves margin for shapes where the BS engine fares better
            if (
                exp_nnz + exp_nnz_te <= 200_000_000
                and exp_nnz + exp_nnz_te <= self.expand_max_ratio * bs_total
            ):
                self.relational_mode = "expanded"
                if self.verbose:
                    print(
                        f"BS join expanded: {exp_nnz + exp_nnz_te} entries "
                        f"(BS form {bs_total}); vector sweeps"
                    )
                train = expand_join(train)
                test = expand_join(test)
            else:
                # FAT blocks: the BS vector engine keeps the VLDB'13
                # dedup (per-feature cost O(nnz(block))) while drawing
                # joint (w_j, v_j) vectors from per-block-row caches
                # (learners/mcmc_rel_vector.py); it honours `mesh` (A and
                # the per-case chunks shard over `data`, w/V over
                # `model`). The exact per-factor BS engine remains the
                # fallback for heavily skewed joins (its cache build pads
                # per-block-row case lists to the row maximum).
                from libfm_tpu.learners.mcmc_rel_vector import (
                    bs_vector_skew,
                    learn_relational_vector,
                )

                if self.bs_vector and bs_vector_skew(train) <= 16.0:
                    self.relational_mode = "bs_vector"
                    return learn_relational_vector(self, train, test)
                if self.mesh is not None and self.verbose:
                    print(
                        "WARNING: skewed/disabled fat relational blocks "
                        "run on the exact BS engine, which is "
                        "single-device; -mesh ignored."
                    )
                self.relational_mode = "bs"
                return self._learn_relational(train, test)
        cfg = self.cfg
        f = self.dtype
        # statistic-accumulation dtype: f32 for f32/bf16 inputs (MXU
        # accumulates f32 natively), f64 when the user asked for f64 —
        # a literal f32 here would silently DOWNCAST f64 operands
        acc_t = jnp.float64 if jnp.dtype(f) == jnp.float64 else jnp.float32
        n, k = cfg.num_features, cfg.num_factors
        d = 1 + k  # joint (w, v) dimension
        self.min_target = train.min_target
        self.max_target = train.max_target
        task = self.task
        do_sample, do_multilevel = self.do_sample, self.do_multilevel
        alpha_0, gamma_0 = self.alpha_0, self.gamma_0
        beta_0, mu_0 = self.beta_0, self.mu_0
        min_t, max_t = self.min_target, self.max_target
        # f32 runaway bound for parameter draws (samplers.DRAW_BOUND),
        # target-scaled; rejected draws keep the old value and count
        draw_bound = samplers.DRAW_BOUND * max(
            1.0, abs(float(min_t)), abs(float(max_t))
        )
        use_linear = cfg.use_linear

        train, sorted_feat0 = self._maybe_reorder_cases(train)
        layout_iter, attr_group_np = self._build_vector_layouts(train)
        G = int(attr_group_np.max()) + 1
        num_attr_per_group = jnp.asarray(
            np.bincount(attr_group_np, minlength=G).astype(np.float64), dtype=f
        )

        # device copies of the static layouts (segment-sharded over the
        # data axis when a mesh is given; padding segments point at
        # feature 0 with zero values, contributing nothing). With a
        # 2-D (data, model) mesh, model state additionally row-shards
        # over `model` (TP) — see the sharding plan below.
        mesh = self.mesh
        tp = False
        sh_model1 = sh_model2 = sh_chunk = sh_A = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(mesh, P())
            D = mesh.shape["data"]
            M = mesh.shape.get("model", 1)
            tp = M > 1
            # TP sharding plan (north-star config #5: V too big for one
            # chip): w[n] and V[n, k] row-sharded over `model`
            # (embedding-table style); the per-feature sufficient
            # statistics GG[Fd_pad, (d+1)^2] and the batched Cholesky
            # draw chunks [FC, ...] sharded over `model` too, so the
            # O(F d^3) draw math and the O(F d^2) stats memory split
            # across the axis. The A=[e|Q] case table shards over
            # `data`. XLA's SPMD partitioner lowers the block gathers
            # (V rows by feature id) and the stats scatters to
            # collectives over ICI.
            if tp:
                sh_model1 = NamedSharding(mesh, P("model"))
                sh_model2 = NamedSharding(mesh, P("model", None))
                sh_chunk = NamedSharding(mesh, P(None, "model", None))
            else:
                sh_model1 = sh_model2 = repl
                sh_chunk = NamedSharding(mesh, P())
            sh_A = NamedSharding(mesh, P("data", None)) if D > 1 else repl

        # TP feature padding: w/V rows must divide evenly over `model`.
        # Padded rows sit in no block and no unobserved list, start at 0
        # and are never drawn; `valid` masks them out of the hyperprior
        # group statistics so all draws match the unpadded run exactly.
        M_ax = mesh.shape.get("model", 1) if mesh is not None else 1
        n_pad = ((n + M_ax - 1) // M_ax) * M_ax if tp else n
        valid = (
            None
            if n_pad == n
            else jnp.asarray((np.arange(n_pad) < n).astype(np.float64), dtype=f)
        )
        attr_group = jnp.asarray(
            np.pad(attr_group_np, (0, n_pad - len(attr_group_np)))
        )

        # Segments are processed under lax.scan in chunks of C segments
        # so the per-step HBM temps (gathered slots, per-segment stats)
        # stay bounded regardless of dataset size. Tunable (experiments
        # only — the default is the measured optimum): bigger chunks
        # mean fewer sequential lane-Cholesky scan steps in the dual
        # pass at the cost of bigger [C, W, d] gather temps.
        SLOT_BUDGET = self._slot_budget
        SEG_BUDGET = 8192  # segments per step (bounds the [C, d+1, d+1] temp)

        def _put_bucket(b, sf2, pad_sf, pad_sf2=0, slice_store=False,
                        dual_c=0):
            """Chunk a host bucket for lax.scan. `sf2` is the secondary
            (dense-remapped) per-segment id array; `pad_sf` the feature
            sentinel used for padding segments; `pad_sf2` the sf2 pad
            value — callers relying on `indices_are_sorted` must pass the
            max real sf2 so padded chunks stay monotone (padded payloads
            are exactly zero, so duplicating a real index is harmless).
            `slice_store` (unique_feats layouts, sf2 == arange): pad sf2
            by CONTINUING the arange so every chunk's GG rows are exactly
            [i*C, (i+1)*C) and the stats store is a slice write."""
            sc, sv, sf = b.slot_case, b.slot_val, b.seg_feat
            C = max(1, min(SLOT_BUDGET // b.width, SEG_BUDGET))
            if mesh is not None:
                C = max(D, (C // D) * D)
            pad = (-len(sf)) % C
            if pad:
                sc = np.concatenate(
                    [sc, np.full((pad, b.width), train.num_rows, np.int32)]
                )
                sv = np.concatenate([sv, np.zeros((pad, b.width), np.float32)])
                sf = np.concatenate([sf, np.full(pad, pad_sf, np.int32)])
                if slice_store:
                    sf2 = np.concatenate(
                        [sf2,
                         np.arange(len(sf2), len(sf2) + pad, dtype=np.int32)]
                    )
                else:
                    sf2 = np.concatenate(
                        [sf2, np.full(pad, pad_sf2, np.int32)]
                    )
            nchunk = len(sf) // C
            sc = sc.reshape(nchunk, C, b.width).copy()
            sv = sv.reshape(nchunk, C, b.width)
            sf = sf.reshape(nchunk, C)
            sf2 = sf2.reshape(nchunk, C)
            # padding slots get UNIQUE dummy row ids (nc + position) so
            # every per-chunk scatter has unique indices — the TPU
            # scatter fast path instead of a sort-based combine. Dummy
            # rows only ever receive zero updates (slot_val == 0).
            pos = np.arange(C * b.width, dtype=np.int32).reshape(C, b.width)
            for ci in range(nchunk):
                m = sc[ci] == train.num_rows
                sc[ci][m] = train.num_rows + pos[m]
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                sh3 = NamedSharding(mesh, P(None, "data", None))
                sh2 = NamedSharding(mesh, P(None, "data"))
                return DevBucket(
                    slot_case=jax.device_put(jnp.asarray(sc), sh3),
                    slot_val=jax.device_put(jnp.asarray(sv, dtype=f), sh3),
                    seg_feat=jax.device_put(jnp.asarray(sf), sh2),
                    seg_feat2=jax.device_put(jnp.asarray(sf2), sh2),
                    width=b.width,
                )
            return DevBucket(
                slot_case=jnp.asarray(sc),
                slot_val=jnp.asarray(sv, dtype=f),
                seg_feat=jnp.asarray(sf),
                seg_feat2=jnp.asarray(sf2),
                width=b.width,
                slice_store=slice_store,
                dual_c=dual_c,
            )

        from libfm_tpu.data.vector_layout import WidthBucket as _WB
        from libfm_tpu.data.vector_layout import slab_partition as _slabp

        # slab window for case-sorted gathers: ~16 MB of A rows (the
        # measured chip-resident zone, BENCHNOTES "Gather cost vs table
        # size"), rounded to a 1024-case multiple
        SLAB = self.slab_cases or max(
            8192, ((16 << 20) // ((1 + k) * jnp.dtype(f).itemsize))
            // 1024 * 1024,
        )

        def _put_slab_bucket(b, sf2, pad_sf2, pad_feat=None):
            """Slab form of _put_bucket for the case-sorted block: one
            scan step per slab, slot ids slab-relative. Falls back to
            the plain bucket when the slab partition is infeasible.
            Single-device only (the dynamic A slice would cross `data`
            shards under a mesh). `pad_feat` (dual buckets) routes
            padding segments at the sentinel feature."""
            out = _slabp(
                b.slot_case, b.slot_val, b.seg_feat, SLAB,
                train.num_rows, pad_feat=pad_feat,
            )
            if out is None:
                return _put_bucket(
                    b, sf2, pad_feat if pad_feat is not None else 0,
                    pad_sf2=pad_sf2,
                )
            sc_rel, sv, sf, starts = out
            if pad_feat is not None:
                sf2_arr = sf  # dual buckets never read sf2
            else:
                # per-feature sf -> sf2 (constant across a feature's
                # segments, so a feature-indexed map is exact; padding
                # entries duplicate their slab's last real feature and
                # stay monotone per slab)
                sf2_map = np.zeros(
                    int(b.seg_feat.max()) + 1, dtype=np.int32
                )
                sf2_map[b.seg_feat] = sf2
                sf2_arr = sf2_map[sf]
            return DevBucket(
                slot_case=jnp.asarray(sc_rel),
                slot_val=jnp.asarray(sv, dtype=f),
                seg_feat=jnp.asarray(sf),
                seg_feat2=jnp.asarray(sf2_arr),
                width=b.width,
                slab_start=jnp.asarray(starts),
                slab=SLAB,
            )

        # case-major dense-update chunking (see DevLayout.up_col): chunk
        # size bounds the [CU, 1+k] dense slice temps
        CU = self._cu_chunk
        nc_up_pad = ((max(train.num_rows, 1) + CU - 1) // CU) * CU

        def _dense_update_arrays(lay, F):
            """[nch, CU] per-case (block-local feature id | F, value | 0)
            arrays for the scatter-free update pass; None when the block
            covers too few cases for a dense pass to pay off."""
            if not self.dense_update:
                return None, None
            col = np.full(nc_up_pad, F, np.int32)
            val = np.zeros(nc_up_pad, np.float32)
            n_entries = 0
            for b in lay.buckets:
                sc = b.slot_case.reshape(-1)
                m = sc < train.num_rows  # padding slots use the sentinel
                n_entries += int(m.sum())
                col[sc[m]] = np.repeat(b.seg_feat, b.width)[m]
                val[sc[m]] = b.slot_val.reshape(-1)[m]
            if n_entries < train.num_rows // 4:
                return None, None  # low coverage: slot update is cheaper
            # one-hot compression: when every entry value is exactly 1
            # (recommender/CTR one-hot data), the value array is implied
            # by col != F — halves the layout's HBM footprint, which
            # matters at k=128 where the A table already fills most of
            # the chip (config #5)
            onehot = bool((val[col != F] == 1.0).all())
            return (
                jnp.asarray(col.reshape(-1, CU)),
                None if onehot else jnp.asarray(val.reshape(-1, CU), dtype=f),
            )

        dev_layouts = []
        observed_list = []
        for lay in layout_iter:
            observed_list.append(np.asarray(lay.features, dtype=np.int32))
            F = lay.num_features
            up_col, up_val = _dense_update_arrays(lay, F)
            # split into dual-eligible (whole single-segment features
            # drawn through the c x c Woodbury system) and dense buckets
            dual_host, dense_host = [], []  # dual: (bucket, dual_c)
            for b in lay.buckets:
                elig = (
                    np.asarray(b.seg_whole)
                    & (b.width < d)
                    & (b.width <= 64)
                    if self.dual_draws
                    else np.zeros(len(b.seg_feat), dtype=bool)
                )
                if elig.any():
                    # split by real-slot count: count<=2 segments (the
                    # zipf tail majority at config #5) run the Woodbury
                    # gram/Cholesky on a 2-slot window — measured
                    # ceiling 0.82 s/iter (lv_dual_probe_r5.json)
                    cseg = (b.slot_case != train.num_rows).sum(axis=1)
                    c2 = (
                        elig & (cseg <= 2)
                        if getattr(self, "_dual_c2_split", True)
                        else np.zeros_like(elig)
                    )
                    for msk, dc in ((c2, 2), (elig & ~c2, 0)):
                        if msk.any():
                            dual_host.append((_WB(
                                b.width, b.slot_case[msk], b.slot_val[msk],
                                b.seg_feat[msk], b.seg_whole[msk],
                            ), dc))
                if (~elig).any():
                    dense_host.append(_WB(
                        b.width, b.slot_case[~elig], b.slot_val[~elig],
                        b.seg_feat[~elig], b.seg_whole[~elig],
                        # a subset of a one-seg-per-feature bucket keeps
                        # the property (order preserved by the mask)
                        unique_feats=b.unique_feats,
                    ))
            feat_is_dual = np.zeros(F, dtype=bool)
            for db, _dc in dual_host:
                feat_is_dual[db.seg_feat] = True
            dense_feats = np.nonzero(~feat_is_dual)[0].astype(np.int32)
            dense_map = np.zeros(F, dtype=np.int32)
            dense_map[dense_feats] = np.arange(len(dense_feats), dtype=np.int32)
            # Case-major stats eligibility: with a dense update layout
            # AND a small F_dense x stats-row product, the stats pass can
            # read A contiguously and reduce per-case rows onto features
            # with ONE one-hot MXU matmul per chunk instead of per-slot
            # A-row gathers (which run at the ~25-35 ns/row gather floor
            # and dominate small-k sweeps — BENCHNOTES.md phase table).
            stats_map = None
            # moment-row width of the case-major stats pass (symmetric
            # QQ packing; one-hot blocks drop the duplicate Q / scalar
            # moments) — keep in sync with sweep_block's MW
            _k = d - 1
            _T = _k * (_k + 1) // 2
            _MW = (_T + 2 * _k + 2) if up_val is None else (_T + 3 * _k + 5)
            _Fd = len(dense_feats)
            # eligibility: the one-hot moment matmul costs about
            # Fd x nc x MW FLOPs per sweep — use it when that stays
            # ~<=2e13 (~100 ms of MXU) and the moment table is small;
            # big-F or huge-k blocks (ML-10M, config #5) keep the slot
            # path, whose cost scales with nnz not Fd x nc
            if (
                self.case_major_stats
                and up_col is not None
                and _Fd * _MW <= 8_000_000
                and float(_Fd) * _MW * nc_up_pad <= 2e13
            ):
                # precompute per-case DENSE-remapped stats ids on the
                # host (dual/sentinel cases -> out-of-range) so the
                # device kernel needs no per-case id gather at all
                smap = np.full(F + 1, np.int32(1 << 30), np.int32)
                smap[dense_feats] = np.arange(
                    len(dense_feats), dtype=np.int32
                )
                stats_map = jnp.asarray(
                    smap[np.asarray(up_col).reshape(-1)].reshape(-1, 8192)
                )
            # the case-sorted block's stats/dual gathers go slab-local
            # (dynamic_slice'd A windows) — only when its update runs
            # case-major (the slot-update fallback still needs absolute
            # ids) and the chain is single-device
            use_slab = (
                sorted_feat0 is not None
                and len(lay.features)
                and int(lay.features[0]) == sorted_feat0
                and up_col is not None
                and mesh is None
            )
            if use_slab:
                _mk = _put_slab_bucket

                def _mk_dual(b, sf2, dc, F=F):
                    # slab form may reorder slots; the 2-slot window
                    # assumption does not hold there — full width
                    return _put_slab_bucket(b, sf2, 0, pad_feat=F)
            else:
                def _mk(b, sf2, pad_sf2):
                    # unique_feats + identity sf2: store stats via slice
                    # writes (no fat-row GG scatter); mesh keeps the
                    # scatter (GG is model-sharded there)
                    sl = (
                        mesh is None
                        and getattr(b, "unique_feats", False)
                        and np.array_equal(
                            sf2, np.arange(len(sf2), dtype=sf2.dtype)
                        )
                    )
                    return _put_bucket(
                        b, sf2, 0, pad_sf2=pad_sf2, slice_store=sl
                    )

                def _mk_dual(b, sf2, dc, F=F):
                    return _put_bucket(b, sf2, F, dual_c=dc)
            dev_layouts.append(
                DevLayout(
                    features=jnp.asarray(lay.features),
                    groups=jnp.asarray(lay.groups),
                    # with case-major stats the slot stats buckets are
                    # never read (update goes through up_col too) — drop
                    # them to save their HBM
                    buckets=[] if stats_map is not None else [
                        _mk(
                            b, dense_map[b.seg_feat],
                            max(len(dense_feats) - 1, 0),
                        )
                        for b in dense_host
                    ],
                    dual_buckets=[
                        _mk_dual(db, db.seg_feat.copy(), dc)
                        for db, dc in dual_host
                    ],
                    dense_feats=jnp.asarray(dense_feats),
                    F=F,
                    F_dense=len(dense_feats),
                    up_col=up_col,
                    stats_map=stats_map,
                    up_val=up_val,
                )
            )
            # free the host slot arrays as soon as the device copies
            # exist — for big runs the layouts are the largest host
            # allocation after the CSR itself (bounded host peak RSS)
            lay.buckets = []
            del dual_host, dense_host

        # features in no block: posterior == prior draws
        # (/root/reference/src/libfm/src/fm_learn_mcmc.h:467-476)
        _obs_mask = np.ones(n, dtype=bool)
        if observed_list:
            _obs_mask[np.concatenate(observed_list)] = False
        unobserved_np = np.nonzero(_obs_mask)[0].astype(np.int32)
        del _obs_mask  # observed_list stays: the incremental-test-tail
        # build below maps test entries to block-local ids per layout
        # (~4 B/feature of host memory)
        unobserved = jnp.asarray(unobserved_np)
        n_unobs = int(unobserved_np.shape[0])

        nc_train, nc_test = train.num_rows, test.num_rows
        from libfm_tpu.data.streaming import StreamingDataset as _SDS

        is_stream = isinstance(train, _SDS)
        # prediction rows per scan step, sized so the PADDED [C, L, d]
        # gather temp stays ~<=300MB: the TPU (8,128) tile pads L up to 8
        # and d up to the next 128 multiple (d=129 doubles!)
        if is_stream:
            _L = max(1, train.max_row_nnz())
        else:
            _L = max(1, int(np.diff(train.indptr).max()) if train.nnz else 1)
        # the same ROW_CHUNK also chunks the TEST rows — size the budget
        # by whichever set has the wider rows. The test set may itself be
        # a StreamingDataset (the reference streams test data through the
        # same HD cache, libfm.cpp:141-174): its rows then upload chunk
        # by chunk without a resident [nr, L] host matrix.
        test_is_stream = not hasattr(test, "indptr")
        if test_is_stream:
            _L = max(_L, test.max_row_nnz())
        else:
            _L = max(_L, int(np.diff(test.indptr).max()) if test.nnz else 1)
        _Lp = ((_L + 7) // 8) * 8
        _dp = ((d + 127) // 128) * 128
        ROW_CHUNK = int(max(512, min(1 << 18, (300 << 20) // (_Lp * _dp * 4))))

        def _chunk_rows(ids_np, vals_np):
            nr, L = ids_np.shape
            C = min(ROW_CHUNK, max(1, nr))
            pad = (-nr) % C
            if pad:
                ids_np = np.concatenate(
                    [ids_np, np.zeros((pad, L), np.int32)]
                )
                vals_np = np.concatenate(
                    [vals_np, np.zeros((pad, L), np.float32)]
                )
            nchunk = len(ids_np) // C
            return (
                jnp.asarray(ids_np.reshape(nchunk, C, L)),
                jnp.asarray(vals_np.reshape(nchunk, C, L), dtype=f),
            )

        def _chunk_rows_stream(stream, L):
            """Streaming analog of _chunk_rows: build each padded [C, L]
            row chunk from bounded .x windows and upload it before the
            next is built — the full [nr, L] host matrix never exists."""
            from libfm_tpu.data.streaming import stream_sparse_binary

            nr = stream.num_rows
            C = min(ROW_CHUNK, max(1, nr))
            dev_i, dev_v = [], []
            ib = np.zeros((C, L), np.int32)
            vb = np.zeros((C, L), np.float32)
            fill = 0

            def _flush():
                nonlocal ib, vb, fill
                dev_i.append(jnp.asarray(ib))
                dev_v.append(jnp.asarray(vb, dtype=f))
                ib = np.zeros((C, L), np.int32)
                vb = np.zeros((C, L), np.float32)
                fill = 0

            for _, indptr, cols, vals, _, _ in stream_sparse_binary(
                stream.x_path, stream.entry_budget
            ):
                nwin = len(indptr) - 1
                done = 0
                while done < nwin:
                    take = min(nwin - done, C - fill)
                    lo, hi = int(indptr[done]), int(indptr[done + take])
                    lens = np.diff(indptr[done : done + take + 1]).astype(
                        np.int64
                    )
                    row = np.repeat(
                        np.arange(fill, fill + take, dtype=np.int64), lens
                    )
                    offs = np.arange(hi - lo, dtype=np.int64) - np.repeat(
                        (indptr[done : done + take] - lo).astype(np.int64),
                        lens,
                    )
                    ib[row, offs] = cols[lo:hi]
                    vb[row, offs] = vals[lo:hi]
                    fill += take
                    done += take
                    if fill == C:
                        _flush()
            if fill:
                _flush()  # final partial chunk, zero-padded
            return jnp.stack(dev_i), jnp.stack(dev_v)

        if is_stream:
            tr_ids, tr_pv = _chunk_rows_stream(train, _L)
        else:
            tr_ids, tr_pv = _chunk_rows(
                *padded_rows_layout(train.indptr, train.cols, train.vals)
            )
        if test_is_stream:
            te_ids, te_pv = _chunk_rows_stream(test, _L)
        else:
            te_ids, te_pv = _chunk_rows(
                *padded_rows_layout(test.indptr, test.cols, test.vals)
            )

        y_train = jnp.asarray(train.target, dtype=f)
        y_test = jnp.asarray(test.target, dtype=f)
        nec = self.num_eval_cases if self.num_eval_cases is not None else nc_test
        eval_mask = jnp.asarray(
            (np.arange(nc_test) < nec).astype(np.float64), dtype=f
        )

        # Incremental test tail (round 5, VERDICT r4 item 3): test rows
        # ride a tail region of A as [pred | Q], consuming each block's
        # per-feature deltas through the same case-major dense update as
        # train rows (they contribute zero stats — they sit in no slot
        # layout / stats_map). The per-iteration test P-gather
        # disappears (48 ms/iter on the ML-10M headline, 19 on CTR —
        # studies/results/flat_pred_probe_r5.json); the periodic refresh
        # re-grounds the tail. Requires every layout to have the dense
        # update path, test rows conflict-free within each block, and
        # value patterns matching the layout's one-hot compression.
        incr_te = (
            mesh is None
            and nc_test > 0
            and not test_is_stream
            and not is_stream
            and len(dev_layouts) > 0
            and all(dl.up_col is not None for dl in dev_layouts)
            and getattr(self, "flat_incr_test", False)
        )
        if incr_te:
            C_te_rows = te_ids.shape[1]
            te_tail_rows = (
                (max(te_ids.shape[0] * C_te_rows,
                     ((nc_test + CU - 1) // CU) * CU) + CU - 1) // CU
            ) * CU
            te_cols_np = np.asarray(test.cols)
            te_rows_np = test.row_of_entry
            te_vals_np = np.asarray(test.vals, dtype=np.float32)
            for li, dl in enumerate(dev_layouts):
                F_l = dl.F
                lf = observed_list[li].astype(np.int64)
                loc = np.full(n_pad, F_l, np.int32)
                loc[lf] = np.arange(F_l, dtype=np.int32)
                lc = loc[te_cols_np]
                m_ent = lc != F_l
                rows_l = te_rows_np[m_ent]
                if len(rows_l) and np.bincount(
                    rows_l, minlength=nc_test
                ).max() > 1:
                    # a test case holds two features of one block: the
                    # single-slot-per-case update cannot represent it
                    incr_te = False
                    break
                col_l = np.full(te_tail_rows, F_l, np.int32)
                val_l = np.zeros(te_tail_rows, np.float32)
                col_l[rows_l] = lc[m_ent]
                val_l[rows_l] = te_vals_np[m_ent]
                if dl.up_val is None and not (
                    val_l[col_l != F_l] == 1.0
                ).all():
                    incr_te = False  # train one-hot, test not: mismatch
                    break
                dl.te_col = jnp.asarray(col_l.reshape(-1, CU))
                dl.te_val = (
                    None if dl.up_val is None
                    else jnp.asarray(val_l.reshape(-1, CU), dtype=f)
                )
            if not incr_te:
                for dl in dev_layouts:
                    dl.te_col = dl.te_val = None
        else:
            te_tail_rows = 0

        key = jax.random.PRNGKey(self.seed)
        key, kw, kv = jax.random.split(key, 3)
        w = cfg.init_mean + cfg.init_stdev * jax.random.normal(kw, (n,), dtype=f)
        V = cfg.init_mean + cfg.init_stdev * jax.random.normal(kv, (n, k), dtype=f)
        w0_init = jnp.zeros((), f)
        if self.warm_start is not None:  # MCMCLearner.__init__: only w0/V load
            V = jnp.asarray(self.warm_start.v, dtype=f)
            w0_init = jnp.asarray(self.warm_start.w0, dtype=f)
        if not use_linear:
            w = jnp.zeros((n,), f)
        if n_pad != n:
            # pad AFTER drawing so the RNG trajectory (and thus the whole
            # chain) is identical to the unpadded single-device run
            w = jnp.pad(w, (0, n_pad - n))
            V = jnp.pad(V, ((0, n_pad - n), (0, 0)))
        w_lambda = (
            jnp.asarray(self._w_lambda_vec, dtype=f)
            if self._w_lambda_vec is not None
            else jnp.full((G,), self._init_w_lambda, dtype=f)
        )
        v_lambda = (
            jnp.asarray(self._v_lambda_vec, dtype=f)
            if self._v_lambda_vec is not None
            else jnp.full((G, k), self._init_v_lambda, dtype=f)
        )

        def packed_params(w0, w, V):
            # P[j] = (w_j, v_j1..v_jk); one table so prediction needs ONE gather
            return jnp.concatenate([w[:, None], V], axis=1)  # [n, d]

        def _chunk_pred_q(w0, P, cids, cpv):
            rows = P[cids]  # [C, L, d]
            wx = rows[..., 0] * cpv
            vx = rows[..., 1:] * cpv[..., None]
            Q = vx.sum(axis=1)
            sq = (vx * vx).sum(axis=(1, 2))
            pred = 0.5 * ((Q * Q).sum(axis=1) - sq)
            if use_linear:
                pred = pred + wx.sum(axis=1)
            if cfg.use_bias:
                pred = pred + w0
            return pred, Q

        def predict_padded(w0, P, ids, pvals, nc, want_q=True):
            """(pred[nc], Q[nc, k] or None) via a scan over row chunks —
            one row-gather of P per chunk, temps bounded by ROW_CHUNK."""

            def chunk(_, inp):
                pred, Q = _chunk_pred_q(w0, P, inp[0], inp[1])
                return None, ((pred, Q) if want_q else pred)

            _, out = jax.lax.scan(chunk, None, (ids, pvals))
            if want_q:
                preds, Qs = out
                return preds.reshape(-1)[:nc], Qs.reshape(-1, k)[:nc]
            return out.reshape(-1)[:nc], None

        def refresh_A_and_train_metric(w0, P, key, statics, A, init=False):
            """One fused scan over train chunks: recompute predictions,
            write the new A = [e | Q] rows IN PLACE into the carried A
            (no second full-size copy), accumulate the train metric, and
            (classification) resample the probit latent targets
            chunk-wise. init=True uses e = pred - y for both tasks (the
            reference's initialisation, mcmc_simultaneous.h:70-86).

            Also returns the [nchunk, C] latent matrix (classification:
            the resampled probit latents; regression/init: y) so the
            classification fast path (refresh_every > 1) can maintain
            pred = e + latent without re-gathering P."""
            nchunk, C = statics["tr_ids"].shape[0], statics["tr_ids"].shape[1]
            ckeys = jax.random.split(key, nchunk)

            def chunk(carry, inp):
                A, acc0, acc1 = carry
                ci, cids, cpv, cy, cm, ck = inp
                pred, Q = _chunk_pred_q(w0, P, cids, cpv)
                if task == TASK_REGRESSION or init:
                    err = (jnp.clip(pred, min_t, max_t) - cy) * cm
                    acc0 = acc0 + (err * err).sum()
                    acc1 = acc1 + cm.sum()
                    e = pred - cy
                    latent = cy
                else:
                    pp = samplers.cdf_gaussian(pred)
                    correct = ((pp >= 0.5) & (cy > 0.0)) | (
                        (pp < 0.5) & (cy < 0.0)
                    )
                    acc0 = acc0 + (correct.astype(f) * cm).sum()
                    acc1 = acc1 + cm.sum()
                    if do_sample:
                        lat_pos = samplers.left_truncated_gaussian(
                            ck, 0.0, pred, 1.0
                        )
                        lat_neg = samplers.right_truncated_gaussian(
                            ck, 0.0, pred, 1.0
                        )
                    else:
                        lat_pos = samplers.left_tn_expectation(pred)
                        lat_neg = samplers.right_tn_expectation(pred)
                    latent = jnp.where(cy >= 0.0, lat_pos, lat_neg)
                    e = pred - latent
                rows = jnp.concatenate([e[:, None], Q], axis=1)
                # zero the rows that fall in the padding tail so dummy
                # slot rows keep contributing exactly nothing
                rows = rows * cm[:, None]
                A = jax.lax.dynamic_update_slice(A, rows, (ci * C, 0))
                return (A, acc0, acc1), latent * cm

            (A, m0, m1), lat = jax.lax.scan(
                chunk,
                (A, jnp.zeros((), f), jnp.zeros((), f)),
                (jnp.arange(nchunk, dtype=jnp.int32),
                 statics["tr_ids"], statics["tr_pv"], statics["y_tr_ch"],
                 statics["mask_tr_ch"], ckeys),
            )
            if incr_te:
                # re-ground the incremental test tail: [pred | Q] rows
                # (pad rows get harmless values — never read, and their
                # update slots carry the sentinel feature)
                C_te = statics["te_ids"].shape[1]

                def te_chunk(A, inp):
                    ci, cids, cpv = inp
                    pred, Q = _chunk_pred_q(w0, P, cids, cpv)
                    rows = jnp.concatenate([pred[:, None], Q], axis=1)
                    return jax.lax.dynamic_update_slice(
                        A, rows, (TEST_OFF + ci * C_te, 0)
                    ), None

                A, _ = jax.lax.scan(
                    te_chunk, A,
                    (jnp.arange(statics["te_ids"].shape[0],
                                dtype=jnp.int32),
                     statics["te_ids"], statics["te_pv"]),
                )
            m1 = jnp.maximum(m1, 1.0)
            train_metric = (
                jnp.sqrt(m0 / m1) if task == TASK_REGRESSION else m0 / m1
            )
            return A, train_metric, lat

        # ---------------- block sweep ----------------
        def sweep_block(A, w, V, lay, alpha, w_mu_g, w_lambda_g, v_mu_g,
                        v_lambda_g, key):
            """Joint draws for every feature of one block.

            A: [nc+1, 1+k] = [e | Q] with zero sentinel row.
            Returns updated (A, w, V, n_rejected)."""
            F = lay.F
            feats = lay.features
            groups = lay.groups
            theta_old = jnp.concatenate(
                [w[feats][:, None], V[feats]], axis=1
            )  # [F, d]

            Fd = lay.F_dense
            # dense-path sufficient statistics, accumulated bucket by
            # bucket in chunks of C segments (bounded HBM temps). GG is
            # sized by the DENSE features only (dual features never touch
            # it) and chunk-padded up front so the Cholesky-draw scan can
            # reshape it without a full-size copy.
            # Batched-Cholesky throughput is flat from ~1K systems up
            # (measured: [1024,130,130] chol+solve 46 ms vs [8192,130]
            # 395 ms — same per-feature rate), so small chunks cost no
            # throughput, shrink the [FC, d, d] solve temps 8x (at k=128
            # each [8192,129,129] temp is 1.06 GB after the 129->256
            # lane padding), and cut the tail-chunk padding waste (a
            # 3.3K-feature block used to pad to 8192 dense draws).
            FC = self._fc_chunk
            if tp:
                M_ = mesh.shape["model"]
                FC = max(M_, (FC // M_) * M_)
            Fd_pad = ((max(Fd, 1) + FC - 1) // FC) * FC
            # slice-store buckets write chunk-aligned GG rows
            # [i*C, (i+1)*C): size GG (and the draw chunking with it) to
            # cover the chunk-padded segment count
            slice_rows = max(
                (
                    b.seg_feat2.shape[0] * b.seg_feat2.shape[1]
                    for b in lay.buckets
                    if b.slice_store
                ),
                default=0,
            )
            if slice_rows > Fd_pad:
                Fd_pad = ((slice_rows + FC - 1) // FC) * FC
            # Per-feature sufficient statistics, stored BLOCKED so the
            # MXU work runs at exactly [k, k] instead of [d+1, d+1]: at
            # k=128 the joint [130, 130] outer product pads onto four
            # 128x128 MXU tiles (~26% utilization) and every row pads
            # 130 -> 256 lanes; the blocked layout keeps the heavy
            # hq^T hq factor an exact single tile. Row layout (round 4:
            # SYMMETRIC-packed — hq^T hq is exactly symmetric, entry
            # (i,j) and (j,i) are the same products summed in the same
            # order, so storing the upper triangle T = k(k+1)/2 is
            # bit-lossless and halves every GG store/scatter byte):
            # [Qq_tri(T) | qa(k) | qe(k) | aa | ae] with a = x (the w
            # column of H) and hq = x * qp; e^T e is never needed by the
            # draw and is dropped.
            T = k * (k + 1) // 2
            iu0_np, iu1_np = np.triu_indices(k)
            iu0 = jnp.asarray(iu0_np, jnp.int32)
            iu1 = jnp.asarray(iu1_np, jnp.int32)
            sym_np = np.zeros((k, k), np.int32)
            sym_np[iu0_np, iu1_np] = np.arange(T, dtype=np.int32)
            sym_np[iu1_np, iu0_np] = sym_np[iu0_np, iu1_np]
            sym_idx = jnp.asarray(sym_np.reshape(-1))
            tri_idx = jnp.asarray(
                (iu0_np * k + iu1_np).astype(np.int32)
            )
            GW = T + 2 * k + 2
            GG = jnp.zeros((Fd_pad, GW), f)
            if tp:
                # per-feature stats live row-sharded over `model`; the
                # data-sharded bucket scatters below cross-shard via SPMD
                GG = jax.lax.with_sharding_constraint(GG, sh_model2)

            def _slot_hM(sc, sv, sf, A_src=None):
                A_slot = (A if A_src is None else A_src)[sc]
                # [C, W, 1+k] row gather (slab path: from a resident slice)
                e_slot = A_slot[..., 0]
                Q_slot = A_slot[..., 1:]
                v_seg = V[feats[sf]]  # [C, k]
                qp = Q_slot - sv[..., None] * v_seg[:, None, :]
                h = jnp.concatenate(
                    [sv[..., None], sv[..., None] * qp], axis=-1
                )  # [C, W, d]
                if not use_linear:
                    h = h.at[..., 0].set(0.0)
                return e_slot, qp, h

            if (
                lay.stats_map is not None
                and "stats" not in self._skip_phases
            ):
                # Case-major stats: contiguous A chunk reads + ONE
                # one-hot MXU matmul per chunk instead of per-slot A-row
                # gathers. The accumulated rows are per-case MOMENTS
                # that do not involve v_j — with hq = x(Q - x v_j):
                #   hq oxo hq = x^2 Q oxo Q - x^3 (v oxo Q + Q oxo v)
                #               + x^4 v oxo v
                #   hq . a    = x^2 Q - x^3 v          (a = x)
                #   hq . e    = x e Q - x^2 e v
                # so accumulating [x^2 Q oxo Q | x^2 Q | x^3 Q | x e Q |
                # x^2, x^3, x^4, x e, x^2 e] per dense feature suffices,
                # and the blocked statistic is reconstructed per feature
                # AFTER the scan (O(Fd k^2) elementwise) — no per-case
                # v-gather or id-gather in the hot loop. Dual / sentinel
                # / padding cases map out of the one-hot range and
                # contribute exactly 0.
                CUS = 8192
                upv2 = (
                    None if lay.up_val is None
                    else lay.up_val.reshape(-1, CUS)
                )
                iotaF = jnp.arange(Fd_pad, dtype=jnp.int32)
                # The QQ moment is symmetric, so only the upper triangle
                # (T = k(k+1)/2 columns, hoisted above with GW) is
                # accumulated — the mirror entries are the same
                # commutative products summed in the same order, so the
                # packing is bit-lossless. One-hot blocks (x == 1 for
                # every entry) additionally collapse Q2 == Q3 == Q and
                # m2 == m3 == m4 == count, mxe == m2e == sum(e): their
                # moment row is [QQ_sym | Q | eQ | 1 | e]. Both cuts
                # shrink the one-hot matmul's MW (its FLOP factor) ~2x.
                oh_block = upv2 is None
                MW = (T + 2 * k + 2) if oh_block else (T + 3 * k + 5)
                MOM = jnp.zeros((Fd_pad, MW), f)
                if tp:
                    MOM = jax.lax.with_sharding_constraint(MOM, sh_model2)

                def stats_case_chunk(MOM, inp):
                    if oh_block:
                        ci, sid = inp
                        xv = None  # one-hot: x = 1 for every real case
                    else:
                        ci, sid, xv = inp
                    A_chunk = jax.lax.dynamic_slice(
                        A, (ci * CUS, 0), (CUS, 1 + k)
                    )
                    e_c = A_chunk[:, 0]
                    Q_c = A_chunk[:, 1:]
                    if xv is None:
                        QQ = Q_c[:, iu0] * Q_c[:, iu1]  # [CUS, T]
                        rows = jnp.concatenate(
                            [
                                QQ, Q_c, e_c[:, None] * Q_c,
                                jnp.ones((CUS, 1), f), e_c[:, None],
                            ],
                            axis=-1,
                        )
                    else:
                        x2 = xv * xv
                        x3 = x2 * xv
                        x4 = x2 * x2
                        Q2 = x2[:, None] * Q_c
                        Q3 = x3[:, None] * Q_c
                        QQ = Q2[:, iu0] * Q_c[:, iu1]  # [CUS, T]
                        xe = xv * e_c
                        rows = jnp.concatenate(
                            [
                                QQ, Q2, Q3, xe[:, None] * Q_c,
                                x2[:, None], x3[:, None], x4[:, None],
                                xe[:, None], (x2 * e_c)[:, None],
                            ],
                            axis=-1,
                        )
                    onehot = (
                        sid[:, None] == iotaF[None, :]
                    ).astype(f)
                    MOM = MOM + jnp.einsum(
                        "cf,cs->fs", onehot, rows,
                        preferred_element_type=acc_t,
                    ).astype(f)
                    return MOM, None

                iot = jnp.arange(lay.stats_map.shape[0], dtype=jnp.int32)
                MOM, _ = jax.lax.scan(
                    stats_case_chunk, MOM,
                    (iot, lay.stats_map)
                    if oh_block
                    else (iot, lay.stats_map, upv2),
                )
                # reconstruct the blocked statistic per dense feature
                vpadded = jnp.zeros((Fd_pad, k), f)
                vpadded = vpadded.at[: lay.F_dense].set(
                    theta_old[lay.dense_feats][:, 1:],
                    unique_indices=True,
                )
                M2 = MOM[:, :T]  # already symmetric-packed, as GG wants
                if oh_block:
                    S2 = S3 = MOM[:, T : T + k]
                    SQe = MOM[:, T + k : T + 2 * k]
                    m2 = m3 = m4 = MOM[:, -2]
                    mxe = m2e = MOM[:, -1]
                else:
                    S2 = MOM[:, T : T + k]
                    S3 = MOM[:, T + k : T + 2 * k]
                    SQe = MOM[:, T + 2 * k : T + 3 * k]
                    m2 = MOM[:, -5]
                    m3 = MOM[:, -4]
                    m4 = MOM[:, -3]
                    mxe = MOM[:, -2]
                    m2e = MOM[:, -1]
                # packed (i, j) = (iu0, iu1) entries of v (x) S3 + S3 (x) v
                # and v (x) v — same scalar ops as the old full-square
                # form, just restricted to the stored triangle
                vS3 = vpadded[:, iu0] * S3[:, iu1]
                S3v = S3[:, iu0] * vpadded[:, iu1]
                vv = vpadded[:, iu0] * vpadded[:, iu1]
                Qq_r = M2 - vS3 - S3v + m4[:, None] * vv
                qe_r = SQe - m2e[:, None] * vpadded
                if use_linear:
                    qa_r = S2 - m3[:, None] * vpadded
                    aa_r = m2[:, None]
                    ae_r = mxe[:, None]
                else:
                    qa_r = jnp.zeros_like(vpadded)
                    aa_r = jnp.zeros((Fd_pad, 1), f)
                    ae_r = jnp.zeros((Fd_pad, 1), f)
                GG = GG + jnp.concatenate(
                    [Qq_r, qa_r, qe_r, aa_r, ae_r], axis=-1
                )

            for b in (lay.buckets if "stats" not in self._skip_phases else []):
                _slab = b.slab  # static per bucket
                _slice = b.slice_store

                def stats_chunk(GG, inp, _slab=_slab, _slice=_slice):
                    if _slab:
                        sc, sv, sf, sf2, st = inp
                        A_src = jax.lax.dynamic_slice(
                            A, (st, 0), (_slab, 1 + k)
                        )
                    else:
                        sc, sv, sf, sf2 = inp
                        A_src = None
                    e_slot, qp, h = _slot_hM(sc, sv, sf, A_src)
                    a = h[..., 0]  # [C, W] — x, or 0 when w is frozen
                    hq = h[..., 1:]  # [C, W, k] — x * qp
                    # experiment knob (_stats_bf16): feed the PSD outer-
                    # product accumulation to the MXU in bf16 with f32
                    # accumulation (f32 matmuls run at a fraction of the
                    # bf16 MXU rate). Default off; quality measured in
                    # studies before any flip.
                    hq_m = (
                        hq.astype(jnp.bfloat16)
                        if self._stats_bf16 and f == jnp.float32
                        else hq
                    )
                    Qq = jnp.einsum(
                        "swi,swj->sij", hq_m, hq_m,
                        preferred_element_type=acc_t,
                    ).astype(f)
                    # pack the exactly-symmetric outer product to its
                    # upper triangle (bit-lossless; halves the GG row)
                    Qq_t = jnp.take(
                        Qq.reshape(Qq.shape[0], -1), tri_idx, axis=1
                    )
                    qa = jnp.einsum("swi,sw->si", hq, a)
                    qe = jnp.einsum("swi,sw->si", hq, e_slot)
                    aa = (a * a).sum(axis=1)
                    ae = (a * e_slot).sum(axis=1)
                    Gseg = jnp.concatenate(
                        [Qq_t, qa, qe, aa[:, None], ae[:, None]],
                        axis=-1,
                    )
                    # row scatter-add touches only this chunk's feature
                    # rows; a full `GG + seg_sum(...)` would rewrite the
                    # whole multi-GB carry on every scan step (measured:
                    # that dominated k=128 sweeps)
                    if _slice or self._stats_store == "slice":
                        # unique_feats layout: this chunk's rows ARE GG
                        # rows [sf2[0], sf2[0]+C) in order — store with a
                        # slice write instead of the fat-row scatter-add
                        # (0.51 s/iter of the ML-10M headline).
                        # (self._stats_store == "slice" is the
                        # profiling-only override with WRONG results on
                        # non-unique layouts; clamp the chunk so the
                        # override also times layouts whose chunk row
                        # count exceeds GG's — k=128 zipf blocks.)
                        Gw, off = Gseg, sf2[0]
                        if Gseg.shape[0] > GG.shape[0]:
                            # override-only situation (real slice layouts
                            # size GG to cover their chunks)
                            Gw = Gseg[: GG.shape[0]]
                            off = jnp.zeros_like(off)
                        GG = jax.lax.dynamic_update_slice(
                            GG, Gw, (off, 0)
                        )
                    else:
                        GG = GG.at[sf2].add(Gseg, indices_are_sorted=True)
                    return GG, None

                xs = (b.slot_case, b.slot_val, b.seg_feat, b.seg_feat2)
                if _slab:
                    xs = xs + (b.slab_start,)
                GG, _ = jax.lax.scan(stats_chunk, GG, xs)

            lam = jnp.concatenate(
                [w_lambda_g[groups][:, None], v_lambda_g[groups]], axis=1
            )  # [F, d]
            mu_pr = jnp.concatenate(
                [w_mu_g[groups][:, None], v_mu_g[groups]], axis=1
            )
            if not use_linear:
                # freeze w: infinite prior precision at prior mean 0
                lam = lam.at[:, 0].set(1e30)
                mu_pr = mu_pr.at[:, 0].set(0.0)

            # theta buffer with a sentinel row (dual padding segments
            # scatter there; sliced off at the end)
            th_buf = jnp.concatenate([theta_old, jnp.zeros((1, d), f)], 0)
            n_rej = jnp.zeros((), jnp.int32)

            # ---- dense path: batched d x d Cholesky draws over feature
            # chunks ([FC, d, d] linear-algebra temps stay bounded) ----
            if Fd > 0 and ({"draw", "dense"} & self._skip_phases):
                # profiling: keep the stats pass alive (a draw-skip would
                # otherwise dead-code-eliminate its only consumer)
                n_rej = n_rej + jnp.isnan(jnp.sum(GG)).astype(jnp.int32)
            if Fd > 0 and not ({"draw", "dense"} & self._skip_phases):
                dfeats = lay.dense_feats

                def _padF(x, fill=0.0):
                    pad = Fd_pad - Fd
                    if pad == 0:
                        return x
                    w_ = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
                    return jnp.pad(x, w_, constant_values=fill)

                # split only the LEADING dim (a true free reshape — going
                # straight to square would materialise all of GG with
                # tile padding); chunks reshape to square on their own.
                GG_c = GG.reshape(-1, FC, GW)
                th_c = _padF(theta_old[dfeats]).reshape(-1, FC, d)
                lam_c = _padF(lam[dfeats], fill=1.0).reshape(-1, FC, d)
                mu_c = _padF(mu_pr[dfeats]).reshape(-1, FC, d)
                if do_sample:
                    key, kz = jax.random.split(key)
                    z_c = jax.random.normal(kz, (Fd_pad, d), dtype=f).reshape(
                        -1, FC, d
                    )
                else:
                    z_c = jnp.zeros((Fd_pad // FC, FC, d), f)
                if tp:
                    # each scan step's [FC, ...] Cholesky batch splits
                    # over `model`: the O(F d^3) draw math is the TP win
                    GG_c, th_c, lam_c, mu_c, z_c = (
                        jax.lax.with_sharding_constraint(x, sh_chunk)
                        for x in (GG_c, th_c, lam_c, mu_c, z_c)
                    )

                def draw_chunk(_, inp):
                    # Blocked draw of theta = (w, v) from the blocked
                    # stats: Lam = [[l00, l0v], [l0v^T, Lvv]] is factored
                    # by a rank-1 Schur step so the Cholesky and both
                    # triangular solves run at exactly [FC, k, k] — the
                    # joint [FC, 1+k, 1+k] system pads every row to the
                    # next 128-lane tile (2x VPU work at k=128).
                    GGf, thf, lamf, muf, zf = inp
                    if k == 0:  # pure linear model: scalar conjugate draw
                        aa = GGf[:, 0]
                        ae = GGf[:, 1]
                        prec = alpha * aa + lamf[:, 0]
                        mean = (
                            alpha * aa * thf[:, 0]
                            - alpha * ae
                            + lamf[:, 0] * muf[:, 0]
                        ) / prec
                        th_new = (mean + zf[:, 0] / jnp.sqrt(prec))[:, None]
                        ok = (
                            jnp.isfinite(th_new)
                            & (jnp.abs(th_new) <= draw_bound)
                        ).all(axis=1, keepdims=True)
                        th_new = jnp.where(ok, th_new, thf)
                        return None, (
                            th_new,
                            jnp.sum(~ok[:, 0]).astype(jnp.int32),
                        )
                    # unpack the symmetric-packed triangle back to the
                    # full [k, k] block the solves want ([FC, k*k]
                    # lane-gather per chunk — tiny next to the Cholesky)
                    Qq = GGf[:, :T][:, sym_idx].reshape(FC, k, k)
                    qa = GGf[:, T : T + k]
                    qe = GGf[:, T + k : T + 2 * k]
                    aa = GGf[:, T + 2 * k]
                    ae = GGf[:, T + 2 * k + 1]
                    th0, thv = thf[:, 0], thf[:, 1:]
                    lam0, lamv = lamf[:, 0], lamf[:, 1:]
                    # b = alpha * HtH theta - alpha * Hte + lam * mu
                    b0 = (
                        alpha * (aa * th0 + (qa * thv).sum(-1))
                        - alpha * ae
                        + lam0 * muf[:, 0]
                    )
                    bv = (
                        alpha
                        * (
                            qa * th0[:, None]
                            + jnp.einsum("fij,fj->fi", Qq, thv)
                        )
                        - alpha * qe
                        + lamv * muf[:, 1:]
                    )
                    # blocked Cholesky: L = [[s0, 0], [col, chol(S)]]
                    s0 = jnp.sqrt(alpha * aa + lam0)  # [FC]
                    col = alpha * qa / s0[:, None]  # [FC, k]
                    S = (
                        alpha * Qq
                        + jax.vmap(jnp.diag)(lamv)
                        - jnp.einsum("fi,fj->fij", col, col)
                    )
                    # batch-in-lanes factorization: XLA's batched
                    # cholesky/solve run ~5-30x above the VPU floor for
                    # these small systems (ops/lane_chol.py docstring)
                    cholS = cholesky_lanes(S)
                    # mu + L^-T z = L^-T (L^-1 b + z): two triangular
                    # solves total instead of three
                    y0 = b0 / s0
                    yv = solve_lower_lanes(cholS, bv - col * y0[:, None])
                    if do_sample:
                        y0 = y0 + zf[:, 0]
                        yv = yv + zf[:, 1:]
                    xv = solve_upper_lanes(cholS, yv)
                    x0 = (y0 - (col * xv).sum(-1)) / s0
                    th_new = jnp.concatenate([x0[:, None], xv], axis=1)
                    ok = (
                        jnp.isfinite(th_new)
                        & (jnp.abs(th_new) <= draw_bound)
                    ).all(axis=1, keepdims=True)
                    th_new = jnp.where(ok, th_new, thf)
                    return None, (th_new, jnp.sum(~ok[:, 0]).astype(jnp.int32))

                _, (theta_new_c, rej_c) = jax.lax.scan(
                    draw_chunk, None, (GG_c, th_c, lam_c, mu_c, z_c)
                )
                th_buf = th_buf.at[dfeats].set(
                    theta_new_c.reshape(Fd_pad, d)[:Fd], unique_indices=True
                )
                n_rej = n_rej + rej_c.sum()

            # ---- dual path: whole-feature segments drawn through the
            # c x c Woodbury system (Bhattacharya et al. 2016): with
            # Lam = D + a H^T H,  Lam^-1 H^T = D^-1 H^T (I + a H D^-1
            # H^T)^-1, so posterior mean and an exact N(mu, Lam^-1)
            # sample need only a W x W Cholesky per feature — the d x d
            # system (and its ~6 full passes over [FC, d, d]) never
            # materialises. Exactness validated in tests against the
            # dense path. ----
            for b in (
                lay.dual_buckets
                if not ({"draw", "dual"} & self._skip_phases)
                else []
            ):
                nch = b.slot_case.shape[0]
                key, kb_ = jax.random.split(key)
                ckeys = jax.random.split(kb_, nch)
                _slab = b.slab
                _dc = b.dual_c

                def dual_chunk(carry, inp, _slab=_slab, _dc=_dc):
                    th_buf, n_rej = carry
                    if _slab:
                        sc, sv, sf, ck, st = inp
                        A_src = jax.lax.dynamic_slice(
                            A, (st, 0), (_slab, 1 + k)
                        )
                    else:
                        sc, sv, sf, ck = inp
                        A_src = None
                    e_slot, qp, h = _slot_hM(sc, sv, sf, A_src)  # h [C, W, d]
                    if _dc:
                        # count<=_dc bucket: every real entry sits in
                        # the first _dc slots (layout fill order); the
                        # dropped slots are zero-payload padding
                        h = h[:, :_dc]
                        e_slot = e_slot[:, :_dc]
                    elif getattr(self, "_dual_slice_probe", 0):
                        # profiling only (WRONG results for counts > c):
                        # ceiling of the closed-form count<=c dual idea —
                        # the W x W gram/Cholesky shrinks to c x c while
                        # the slot gather stays W wide
                        _c = self._dual_slice_probe
                        h = h[:, :_c]
                        e_slot = e_slot[:, :_c]
                    thf = theta_old[jnp.minimum(sf, F - 1)]
                    lamf = lam[jnp.minimum(sf, F - 1)]
                    muf = mu_pr[jnp.minimum(sf, F - 1)]
                    Dinv = 1.0 / lamf  # [C, d]
                    sqa = jnp.sqrt(alpha)
                    Phi = sqa * h  # [C, W, d]
                    ytil = sqa * (
                        jnp.einsum("cwd,cd->cw", h, thf - muf) - e_slot
                    )
                    Kg = jnp.einsum(
                        "cwd,cd,cud->cwu", Phi, Dinv, Phi,
                        preferred_element_type=acc_t,
                    ).astype(f)
                    W_ = Kg.shape[-1]
                    Mk = Kg + jnp.eye(W_, dtype=f)
                    cholK = cholesky_lanes(Mk)  # batch-in-lanes (~30x XLA)
                    if do_sample:
                        ku, kd = jax.random.split(ck)
                        u = jnp.sqrt(Dinv) * jax.random.normal(
                            ku, Dinv.shape, dtype=f
                        )
                        dl = jax.random.normal(kd, ytil.shape, dtype=f)
                        v = jnp.einsum("cwd,cd->cw", Phi, u) + dl
                    else:
                        u = jnp.zeros_like(Dinv)
                        v = jnp.zeros_like(ytil)
                    wsol = cho_solve_lanes(cholK, ytil - v)
                    phi_vec = u + Dinv * jnp.einsum("cwd,cw->cd", Phi, wsol)
                    th_new = muf + phi_vec
                    ok = (
                        jnp.isfinite(th_new)
                        & (jnp.abs(th_new) <= draw_bound)
                    ).all(axis=1, keepdims=True)
                    th_new = jnp.where(ok, th_new, thf)
                    th_buf = th_buf.at[sf].set(th_new)
                    n_rej = n_rej + jnp.sum(
                        (~ok[:, 0]) & (sf < F)
                    ).astype(jnp.int32)
                    return (th_buf, n_rej), None

                xs = (b.slot_case, b.slot_val, b.seg_feat, ckeys)
                if _slab:
                    xs = xs + (b.slab_start,)
                (th_buf, n_rej), _ = jax.lax.scan(
                    dual_chunk, (th_buf, n_rej), xs
                )

            theta_new = th_buf[:F]
            delta = theta_new - theta_old  # [F, d]

            # apply updates: e += x*(dw + qp . dv); Q += x*dv. qp is
            # recomputed per chunk with the PRE-draw V (V is updated after
            # this loop), which the delta formulas require. Covers both
            # dense and dual segments (their union is every entry).
            #
            # Fast path: a conflict-free block touches each case at most
            # once, so the update applies CASE-MAJOR as dense chunk
            # reads + dynamic_update_slice writes (no scatter; the
            # per-feature delta/v_old tables are small gathers). The
            # sentinel id F hits the appended zero rows, so uncovered
            # and padding cases add exactly 0.
            # one fused per-feature table [F+1, d+1]: the delta AND the
            # scalar s_j = v_old_j . dv_j, using the identity
            # qp . dv = Q . dv - x * (v_old . dv) — ONE row gather per
            # case/slot instead of two (the gathers, not the dense A
            # traffic, dominate large-F blocks). Row F is zero so
            # sentinel/padded lookups contribute exactly 0.
            s_col = jnp.einsum("fk,fk->f", theta_old[:, 1:], delta[:, 1:])
            upd_tab = jnp.concatenate(
                [delta, s_col[:, None]], axis=1
            )  # [F, d+1]
            upd_tab = jnp.concatenate(
                [upd_tab, jnp.zeros((1, d + 1), f)], axis=0
            )
            if "update" in self._skip_phases:
                upd_buckets = []
            elif lay.up_col is not None:
                nch_u = lay.up_col.shape[0]
                onehot = lay.up_val is None

                def upd_dense(A, inp):
                    if onehot:
                        ci, cb = inp
                        vb = (cb != lay.F).astype(f)
                    else:
                        ci, cb, vb = inp
                    A_chunk = jax.lax.dynamic_slice(
                        A, (ci * CU, 0), (CU, 1 + k)
                    )
                    dlt = upd_tab[cb]  # [CU, d+1] — the single gather
                    dpred = vb * (
                        dlt[:, 0]
                        + jnp.einsum(
                            "ck,ck->c", A_chunk[:, 1:], dlt[:, 1 : 1 + k]
                        )
                    ) - (vb * vb) * dlt[:, 1 + k]
                    rows = jnp.concatenate(
                        [dpred[:, None], vb[:, None] * dlt[:, 1 : 1 + k]],
                        axis=1,
                    )
                    return (
                        jax.lax.dynamic_update_slice(
                            A, A_chunk + rows, (ci * CU, 0)
                        ),
                        None,
                    )

                iot = jnp.arange(nch_u, dtype=jnp.int32)
                A, _ = jax.lax.scan(
                    upd_dense, A,
                    (iot, lay.up_col) if onehot
                    else (iot, lay.up_col, lay.up_val),
                )
                if incr_te and lay.te_col is not None:
                    # incremental test tail: same per-case dense update
                    # at the tail offset (test rows take the parameter
                    # deltas; they contributed nothing to the stats)
                    def upd_dense_te(A, inp):
                        if onehot:
                            ci, cb = inp
                            vb = (cb != lay.F).astype(f)
                        else:
                            ci, cb, vb = inp
                        A_chunk = jax.lax.dynamic_slice(
                            A, (TEST_OFF + ci * CU, 0), (CU, 1 + k)
                        )
                        dlt = upd_tab[cb]
                        dpred = vb * (
                            dlt[:, 0]
                            + jnp.einsum(
                                "ck,ck->c", A_chunk[:, 1:],
                                dlt[:, 1 : 1 + k],
                            )
                        ) - (vb * vb) * dlt[:, 1 + k]
                        rows = jnp.concatenate(
                            [dpred[:, None],
                             vb[:, None] * dlt[:, 1 : 1 + k]],
                            axis=1,
                        )
                        return (
                            jax.lax.dynamic_update_slice(
                                A, A_chunk + rows, (TEST_OFF + ci * CU, 0)
                            ),
                            None,
                        )

                    iot_te = jnp.arange(
                        lay.te_col.shape[0], dtype=jnp.int32
                    )
                    A, _ = jax.lax.scan(
                        upd_dense_te, A,
                        (iot_te, lay.te_col) if onehot
                        else (iot_te, lay.te_col, lay.te_val),
                    )
                upd_buckets = []
            else:
                upd_buckets = lay.buckets + lay.dual_buckets
            for b in upd_buckets:
                def upd_chunk(A, inp):
                    # same fused identity as the dense pass: dpred =
                    # x*dw + x*(Q . dv) - x^2 * s_j, so the slot pass
                    # needs only the A row gather + ONE [C, d+1] table
                    # gather (the separate V[feats[sf]] gather is gone)
                    sc, sv, sf = inp
                    Q_slot = A[sc][..., 1:]  # [C, W, k]
                    tab = upd_tab[jnp.minimum(sf, F)]  # [C, d+1]
                    dpred = sv * (
                        tab[:, None, 0]
                        + jnp.einsum("swk,sk->sw", Q_slot, tab[:, 1 : 1 + k])
                    ) - (sv * sv) * tab[:, None, 1 + k]
                    dQ = sv[..., None] * tab[:, None, 1 : 1 + k]
                    drows = jnp.concatenate([dpred[..., None], dQ], axis=-1)
                    A = A.at[sc.reshape(-1)].add(
                        drows.reshape(-1, 1 + k), unique_indices=True
                    )
                    return A, None

                A, _ = jax.lax.scan(
                    upd_chunk, A, (b.slot_case, b.slot_val, b.seg_feat)
                )

            w = w.at[feats].set(theta_new[:, 0], unique_indices=True)
            V = V.at[feats].set(theta_new[:, 1:], unique_indices=True)
            if tp:
                w = jax.lax.with_sharding_constraint(w, sh_model1)
                V = jax.lax.with_sharding_constraint(V, sh_model2)
            return A, w, V, n_rej, key

        # ---------------- one iteration ----------------
        def draw_all(state, statics):
            attr_group = statics["attr_group"]
            num_attr_per_group = statics["num_attr_per_group"]
            unobserved = statics["unobserved"]
            valid = statics["valid"]
            key = state["key"]
            rej = jnp.zeros((), jnp.int32)
            A = state["A"]
            e = A[:nc_train, 0]

            key, k1 = jax.random.split(key)
            alpha, r = draw_alpha(
                k1, e, nc_train, state["alpha"], alpha_0, gamma_0,
                do_multilevel, do_sample,
            )
            rej += r

            w0 = state["w0"]
            if cfg.use_bias:
                key, k1 = jax.random.split(key)
                acc = jnp.sum(e) - nc_train * w0
                sigma_sqr = 1.0 / (self.reg0 + alpha * nc_train)
                mean = -sigma_sqr * (alpha * acc - self.w0_mean_0 * self.reg0)
                prop = (
                    samplers.gaussian(k1, mean, jnp.sqrt(sigma_sqr))
                    if do_sample else mean
                )
                w0_new, r = samplers.finite_or(prop, w0, bound=draw_bound)
                rej += r
                A = A.at[:nc_train, 0].add(w0_new - w0)
                if incr_te:
                    # the test tail holds pred, which moves by the bias
                    # delta too
                    A = A.at[TEST_OFF : TEST_OFF + nc_test, 0].add(
                        w0_new - w0
                    )
                w0 = w0_new

            w, V = state["w"], state["V"]
            w_mu, w_lambda = state["w_mu"], state["w_lambda"]
            v_mu, v_lambda = state["v_mu"], state["v_lambda"]
            if do_multilevel:
                if use_linear:
                    key, k1 = jax.random.split(key)
                    w_lambda, w_mu, r = draw_theta_hyperpriors(
                        k1, w, attr_group, num_attr_per_group, w_mu, w_lambda,
                        alpha_0, gamma_0, beta_0, mu_0, do_sample,
                        valid=valid,
                    )
                    rej += r
                if k > 0:
                    key, k1 = jax.random.split(key)
                    V_s = V if valid is None else V * valid[:, None]
                    sum_v = seg_sum(V_s, attr_group, G, sorted_ids=False)
                    dev = V - v_mu[attr_group]
                    if valid is not None:
                        dev = dev * valid[:, None]
                    lam_gamma = (
                        beta_0 * (v_mu - mu_0) ** 2 + gamma_0
                        + seg_sum(dev * dev, attr_group, G, sorted_ids=False)
                    )
                    lam_alpha = alpha_0 + num_attr_per_group[:, None] + 1.0
                    ka, kb = jax.random.split(k1)
                    lam_prop = (
                        samplers.gamma(ka, lam_alpha / 2.0, lam_gamma / 2.0)
                        if do_sample else lam_alpha / lam_gamma
                    )
                    v_lambda, r1 = samplers.finite_or(lam_prop, v_lambda)
                    mu_mean = (sum_v + beta_0 * mu_0) / (
                        num_attr_per_group[:, None] + beta_0
                    )
                    mu_sigma_sqr = 1.0 / (
                        (num_attr_per_group[:, None] + beta_0) * v_lambda
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

            for lay in statics["dev_layouts"]:
                A, w, V, r, key = sweep_block(
                    A, w, V, lay, alpha, w_mu, w_lambda, v_mu, v_lambda, key
                )
                rej += r

            if n_unobs:
                key, ku = jax.random.split(key)
                g_u = attr_group[unobserved]
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
                w_u, r1 = samplers.finite_or(w_u, w[unobserved], bound=draw_bound)
                v_u, r2 = samplers.finite_or(v_u, V[unobserved], bound=draw_bound)
                rej += r1 + r2
                if use_linear:
                    w = w.at[unobserved].set(w_u, unique_indices=True)
                V = V.at[unobserved].set(v_u, unique_indices=True)

            return dict(
                state, A=A, w0=w0, w=w, V=V, alpha=alpha,
                w_mu=w_mu, w_lambda=w_lambda, v_mu=v_mu, v_lambda=v_lambda,
                key=key, rejected=rej,
            )

        def one_step(state, it, statics, refresh=True):
            y_test = statics["y_test"]
            eval_mask = statics["eval_mask"]
            state = draw_all(state, statics)
            P = packed_params(state["w0"], state["w"], state["V"])
            if "pred" in self._skip_phases:  # profiling only (wrong results)
                pred_test = jnp.zeros((nc_test,), f)
            elif incr_te:
                # incremental tail: the update passes + w0 delta keep
                # [pred | Q] current; one slice instead of a P-gather
                pred_test = state["A"][TEST_OFF : TEST_OFF + nc_test, 0]
            else:
                pred_test, _ = predict_padded(
                    state["w0"], P, statics["te_ids"], statics["te_pv"],
                    nc_test, want_q=False,
                )

            key = state["key"]
            key, kr = jax.random.split(key)
            latent = state.get("latent")
            if refresh:
                A, train_metric, latent = refresh_A_and_train_metric(
                    state["w0"], P, kr, statics, state["A"]
                )
            elif task == TASK_REGRESSION:
                # regression fast path (refresh_every > 1): the sweeps
                # maintain A = [e | Q] incrementally and exactly (up to
                # float drift, killed by the periodic refresh); the
                # train metric comes straight from e = pred - y.
                # The reference itself notes the per-iteration re-predict
                # is "not necessary but increases numerical stability"
                # (fm_learn_mcmc_simultaneous.h:123-124).
                A = state["A"]
                y_flat = statics["y_tr_ch"].reshape(-1)
                m_flat = statics["mask_tr_ch"].reshape(-1)
                e = jax.lax.dynamic_slice_in_dim(A[:, 0], 0, y_flat.shape[0])
                pred_tr = e + y_flat
                err = (jnp.clip(pred_tr, min_t, max_t) - y_flat) * m_flat
                cnt = jnp.maximum(m_flat.sum(), 1.0)
                train_metric = jnp.sqrt((err * err).sum() / cnt)
            else:
                # classification fast path (refresh_every > 1): the
                # probit latent resample needs only the CURRENT train
                # predictions, and pred = e + latent is exact because
                # the sweeps maintain e incrementally for the latents
                # the draws conditioned on. Resample chunk-wise with the
                # same [nchunk, C] key granularity as the full refresh,
                # then fold the latent delta back into the e column:
                # e' = pred - latent' = e + (latent - latent'). The full
                # gather-refresh still runs every R-th iteration to
                # clear float drift (same argument, and the same drift
                # test pattern, as the regression fast path).
                A = state["A"]
                y_ch = statics["y_tr_ch"]          # [nchunk, C]
                m_ch = statics["mask_tr_ch"]
                nchunk, C = y_ch.shape
                e_flat = jax.lax.dynamic_slice_in_dim(
                    A[:, 0], 0, nchunk * C
                )
                pred_ch = e_flat.reshape(nchunk, C) + latent
                pp = samplers.cdf_gaussian(pred_ch)
                correct = ((pp >= 0.5) & (y_ch > 0.0)) | (
                    (pp < 0.5) & (y_ch < 0.0)
                )
                cnt = jnp.maximum(m_ch.sum(), 1.0)
                train_metric = (correct.astype(f) * m_ch).sum() / cnt
                ckeys = jax.random.split(kr, nchunk)
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
                A = A.at[: nchunk * C, 0].set(e_new.reshape(-1))
                latent = lat_new
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
            if task == TASK_REGRESSION:
                m_this = _masked_rmse_mae(pred_this, y_test, eval_mask, min_t, max_t, 1.0)
                m_all = _masked_rmse_mae(
                    pred_sum_all, y_test, eval_mask, min_t, max_t, 1.0 / n_all
                )
                m_but5 = _masked_rmse_mae(
                    pred_sum_all_but5, y_test, eval_mask, min_t, max_t, 1.0 / n_but5
                )
            else:
                m_this = _masked_acc_ll(pred_this, y_test, eval_mask, 1.0)
                m_all = _masked_acc_ll(pred_sum_all, y_test, eval_mask, 1.0 / n_all)
                m_but5 = _masked_acc_ll(
                    pred_sum_all_but5, y_test, eval_mask, 1.0 / n_but5
                )

            new_state = dict(
                state, A=A, pred_this=pred_this, pred_sum_all=pred_sum_all,
                pred_sum_all_but5=pred_sum_all_but5, key=key,
            )
            # classification only: regression must NOT gain a latent key
            # mid-run — the state pytree would change at the first
            # refresh and force fresh jit variants whose compiles land
            # INSIDE the measured cycle (ALS 0.162 -> 0.226, headline
            # 0.88 -> 29.7 s/iter before this guard — als_bisect.json)
            if task != TASK_REGRESSION:
                new_state["latent"] = latent
            metrics = dict(
                train=train_metric, this=m_this, all=m_all, but5=m_but5,
                alpha=state["alpha"], rejected=state["rejected"],
                w_mu=state["w_mu"], w_lambda=state["w_lambda"],
                v_mu=state["v_mu"], v_lambda=state["v_lambda"],
            )
            if task != TASK_REGRESSION:
                from libfm_tpu.learners.mcmc import _masked_auc

                metrics["auc"] = _masked_auc(pred_sum_all, y_test, eval_mask)
            return new_state, metrics

        @partial(jax.jit, donate_argnums=(0,))
        def run_chunk(state, its, statics):
            """One dispatch: lax.scan over the chunk's fast steps, then
            the refresh step (its[-1] is always a refresh point —
            dispatch_chunks). Per-step metrics come back stacked [L,…];
            the ~28 ms tunnel round-trip per dispatch amortizes over L
            (see mcmc.dispatch_chunks)."""
            L = its.shape[0]
            if L > 1:
                state, ms = jax.lax.scan(
                    lambda st, it_: one_step(st, it_, statics, False),
                    state, its[:-1],
                )
            state, m_last = one_step(state, its[-1], statics, True)
            if L > 1:
                return state, jax.tree.map(
                    lambda a, b: jnp.concatenate([a, b[None]], axis=0),
                    ms, m_last,
                )
            return state, jax.tree.map(lambda b: b[None], m_last)

        # ---------------- init & loop ----------------
        TEST_OFF = nc_train + SLOT_BUDGET  # incremental test tail start
        A_rows = nc_train + SLOT_BUDGET + te_tail_rows
        if mesh is not None:
            # the data-sharded A table must split evenly over `data`;
            # extra rows extend the dummy tail (never read, zero writes)
            A_rows = ((A_rows + D - 1) // D) * D

        @jax.jit
        def init_A(w0_0, w, V, key, statics):
            P0 = packed_params(w0_0, w, V)
            A0, _, lat0 = refresh_A_and_train_metric(
                w0_0, P0, key, statics,
                jnp.zeros((A_rows, 1 + k), f), init=True,
            )
            return A0, lat0

        nch, C_rows = tr_ids.shape[0], tr_ids.shape[1]
        y_tr_pad = np.zeros(nch * C_rows, dtype=np.float64)
        y_tr_pad[:nc_train] = np.asarray(train.target, dtype=np.float64)
        m_tr_pad = np.zeros(nch * C_rows, dtype=bool)
        m_tr_pad[:nc_train] = True
        statics = dict(
            dev_layouts=dev_layouts,
            tr_ids=tr_ids, tr_pv=tr_pv, te_ids=te_ids, te_pv=te_pv,
            y_tr_ch=jnp.asarray(y_tr_pad.reshape(nch, C_rows), dtype=f),
            mask_tr_ch=jnp.asarray(m_tr_pad.reshape(nch, C_rows), dtype=f),
            y_test=y_test, eval_mask=eval_mask,
            attr_group=attr_group, num_attr_per_group=num_attr_per_group,
            unobserved=unobserved, valid=valid,
        )
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
            # probit latents (classification fast path; part of the
            # sampler state, so checkpointed for exact resume)
            state["latent"] = lat0
        # restore BEFORE the sharded device_put so a resumed run gets the
        # same sharding plan as a fresh one (restore yields host arrays)
        self.history = []
        start_iter = 0
        if self.checkpoint_path:
            state, start_iter = self._maybe_restore(state)
        if mesh is not None:
            # hyperparameters/scalars replicated; slot layouts sharded
            # over `data` (put above); with a model axis, w/V row-shard
            # over `model` and the A case table over `data`
            sh_state = {key_: repl for key_ in state}
            sh_state["w"] = sh_model1
            sh_state["V"] = sh_model2
            sh_state["A"] = sh_A
            state = jax.device_put(state, sh_state)

        # big static arrays go through the jit boundary as ARGUMENTS —
        # closing over them would bake them into the HLO as constants
        # (minutes of compile time + a duplicate HBM copy)
        from libfm_tpu.learners.mcmc import dispatch_chunks

        ckpt_every = (
            self.checkpoint_every
            if (self.checkpoint_path and self.checkpoint_every)
            else 0
        )
        # the first iteration after a (re)start always refreshes
        # (single-step first chunk): numerically it re-grounds a
        # restored A, and it front-loads the refresh-step jit compile
        # into the warm-up window instead of a mid-run cadence hit
        for i0, L in dispatch_chunks(
            start_iter, self.num_iter, self.refresh_every, ckpt_every
        ):
            its = jnp.arange(i0, i0 + L, dtype=jnp.float32)
            if getattr(self, "capture_hlo", False):
                # debug probe (studies/scaling_projection.py): compiled
                # HLO + XLA cost analysis per chunk-length variant
                self._hlo = getattr(self, "_hlo", {})
                if L not in self._hlo:
                    comp = run_chunk.lower(state, its, statics).compile()
                    self._hlo[L] = dict(
                        text=comp.as_text(), cost=comp.cost_analysis()
                    )
            c0 = iter_clocks()
            state, ms = run_chunk(state, its, statics)
            jax.block_until_ready(state["A"])
            c1 = iter_clocks()
            per = tuple((b - a) / L for a, b in zip(c0, c1))
            # one host fetch per CHUNK, and only the leaves the logger
            # needs (hyperparameter tables move only when rlog wants
            # them) — per-leaf device fetches are host round-trips too
            need = {"train", "this", "all", "but5", "alpha", "rejected",
                    "auc"}
            if self.rlog is not None:
                need |= {"w_mu", "w_lambda", "v_mu", "v_lambda"}
            ms_host = jax.device_get(
                {k_: v_ for k_, v_ in ms.items() if k_ in need}
            )
            for j in range(L):
                self._log_iteration(
                    i0 + j, jax.tree.map(lambda x: x[j], ms_host), per
                )
            if ckpt_every and (i0 + L) % ckpt_every == 0:
                self._save_checkpoint(state, i0 + L)
        # test/debug introspection: keep the parameter-table state but
        # NOT the big per-case A table (GBs on large runs — pinning it
        # past learn() would starve a follow-up learn/predict of HBM);
        # record just its sharding evidence
        self._vector_state = {k_: v_ for k_, v_ in state.items() if k_ != "A"}
        self._vector_state["A_shape"] = state["A"].shape
        self._vector_state["A_shard_shapes"] = {
            s.data.shape for s in state["A"].addressable_shards
        }
        from libfm_tpu.learners.mcmc import MCMCState

        self._final_state = MCMCState(
            w0=state["w0"], w=state["w"][:n], vt=state["V"][:n].T,
            alpha=state["alpha"], w_mu=state["w_mu"],
            w_lambda=state["w_lambda"], v_mu=state["v_mu"],
            v_lambda=state["v_lambda"], e=state["A"][:nc_train, 0],
            pred_this=state["pred_this"], pred_sum_all=state["pred_sum_all"],
            pred_sum_all_but5=state["pred_sum_all_but5"], key=state["key"],
            rejected=state["rejected"],
        )
        return self.history


class ALSVectorLearner(MCMCVectorLearner):
    """Vector-wise ALS (block coordinate descent on whole (w_j, v_j))."""

    def __init__(self, *args, **kwargs):
        kwargs.setdefault("do_sample", False)
        kwargs.setdefault("do_multilevel", False)
        super().__init__(*args, **kwargs)

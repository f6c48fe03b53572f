"""Shard-local DP lowering of the case-major sweep (NEXT.md lever #1).

Miniature of studies/dp_shardlocal.py, in the fast suite: the shard_map
DP sweep (local partial moments -> psum_scatter over `data` ->
feature-sharded ridge draws -> all_gather theta deltas -> local A
update) must (a) match the single-device sweep numerically and (b) put
NOTHING A-table-sized on the wire — its complete collective set is
{reduce-scatter [F/D, MW], all-gather [F, 1+k]} per block. This is the
lowering the 2-host 78%-efficiency projection assumes
(BENCHNOTES "Multi-chip scaling projection";
studies/results/dp_shardlocal_r5.json is the full-size run).
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "studies")

import dp_shardlocal as m


@pytest.fixture(scope="module")
def small_problem(monkeypatch_module=None):
    # shrink the study's shape so the test stays fast on the CPU mesh
    m.F, m.K, m.NC = 64, 4, 2048
    assert m.D_MESH == 8 and len(jax.devices()) >= 8
    sid0, sid1, y, w, V = m.make_problem(seed=3)
    A0 = m._init_A(
        jnp.asarray(sid0), jnp.asarray(sid1), jnp.asarray(y),
        jnp.asarray(w), jnp.asarray(V),
    )
    return sid0, sid1, A0, w, V


def test_shardlocal_matches_single_and_keeps_A_off_the_wire(small_problem):
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    sid0, sid1, A0, w, V = small_problem
    f_single = jax.jit(m.sweep_single)
    A_s, w_s, V_s = A0, jnp.asarray(w), jnp.asarray(V)
    for _ in range(2):
        A_s, w_s, V_s = f_single(
            A_s, jnp.asarray(sid0), jnp.asarray(sid1), w_s, V_s
        )

    mesh = Mesh(np.array(jax.devices()[: m.D_MESH]), ("data",))
    sweep_dp = jax.jit(m.make_sweep_shardlocal(mesh))
    args = (
        jax.device_put(A0, NamedSharding(mesh, P("data", None))),
        jax.device_put(jnp.asarray(sid0), NamedSharding(mesh, P("data"))),
        jax.device_put(jnp.asarray(sid1), NamedSharding(mesh, P("data"))),
        jax.device_put(jnp.asarray(w), NamedSharding(mesh, P())),
        jax.device_put(jnp.asarray(V), NamedSharding(mesh, P())),
    )
    hlo = sweep_dp.lower(*args).compile().as_text()
    inv = m.collective_inventory(hlo)

    A_d, w_d, V_d = args[0], args[3], args[4]
    for _ in range(2):
        A_d, w_d, V_d = sweep_dp(A_d, args[1], args[2], w_d, V_d)

    np.testing.assert_allclose(np.asarray(w_d), np.asarray(w_s), atol=5e-5)
    np.testing.assert_allclose(np.asarray(V_d), np.asarray(V_s), atol=5e-5)
    np.testing.assert_allclose(np.asarray(A_d), np.asarray(A_s), atol=5e-4)

    # nothing A-sized crosses the wire; only per-feature stats do
    per_shard_rows = m.NC // m.D_MESH
    assert inv, "no collectives found — SPMD lowering changed?"
    for op in inv:
        assert not (op["shape"] and op["shape"][0] >= per_shard_rows), op
    kinds = {op["kind"] for op in inv}
    assert kinds <= {"reduce-scatter", "all-gather", "all-reduce",
                     "collective-permute"}, kinds

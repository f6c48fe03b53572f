"""Isolate config #5's update-pass costs: chunked dynamic_slice R/W over
a [2.7M, d] table (d = 129 vs 128 vs split 128+e-vector), and the
[CU]-index gather from a [40K, 130] upd table."""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

N, CU = 2_752_512, 131_072  # 21 chunks
NCH = N // CU
res = []


def timeit(fn, *args):
    fn(*args)[0].block_until_ready() if isinstance(fn(*args), tuple) else None
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


# --- slice R/W passes ---
for d in (129, 128):
    A = jnp.ones((N, d), jnp.float32)

    @jax.jit
    def sweep(A):
        def body(A, ci):
            ch = jax.lax.dynamic_slice(A, (ci * CU, 0), (CU, d))
            return jax.lax.dynamic_update_slice(A, ch + 1.0, (ci * CU, 0)), None
        A, _ = jax.lax.scan(body, A, jnp.arange(NCH, dtype=jnp.int32))
        return A

    s = timeit(sweep, A)
    res.append({"case": f"slice_rw_d{d}", "s": round(s, 4),
                "gbps_logical": round(2 * N * d * 4 / s / 1e9, 1)})
    print(res[-1], flush=True)

# split: Q[128] slices + e vector elementwise
AQ = jnp.ones((N, 128), jnp.float32)
ae = jnp.ones((N,), jnp.float32)


@jax.jit
def sweep_split(AQ, ae):
    def body(carry, ci):
        AQ, ae = carry
        ch = jax.lax.dynamic_slice(AQ, (ci * CU, 0), (CU, 128))
        ech = jax.lax.dynamic_slice(ae, (ci * CU,), (CU,))
        AQ = jax.lax.dynamic_update_slice(AQ, ch + 1.0, (ci * CU, 0))
        ae = jax.lax.dynamic_update_slice(ae, ech + 1.0, (ci * CU,))
        return (AQ, ae), None
    (AQ, ae), _ = jax.lax.scan(
        body, (AQ, ae), jnp.arange(NCH, dtype=jnp.int32))
    return AQ, ae


s = timeit(sweep_split, AQ, ae)
res.append({"case": "slice_rw_split", "s": round(s, 4),
            "gbps_logical": round(2 * N * 129 * 4 / s / 1e9, 1)})
print(res[-1], flush=True)

# --- upd_tab gather: [CU] random ids into [40001, 130] inside the scan
tab = jnp.ones((40_001, 130), jnp.float32)
cb = jax.random.randint(jax.random.PRNGKey(0), (NCH, CU), 0, 40_000,
                        dtype=jnp.int32)


@jax.jit
def gsweep(tab, cb):
    def body(acc, c):
        return acc + tab[c].sum(), None
    acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), cb)
    return acc


s = timeit(gsweep, tab, cb)
res.append({"case": "updtab_gather", "s": round(s, 4),
            "ns_per_row": round(s / N * 1e9, 2)})
print(res[-1], flush=True)

open("/root/repo/studies/results/upd_probe.json", "w").write(
    json.dumps(res, indent=1))

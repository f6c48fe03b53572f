"""Does a [N,129] f32 row gather cost 2x a [N,128] one? Decides whether
splitting A=[e|Q] into Q[128-lane] + e is worth engine surgery for
config #5 (large-vocab k=128)."""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 20_000_000  # ~10GB at 129 lanes f32... too big; use 4M rows
N = 4_000_000
R = 2_000_000  # gathered rows per trial
key = jax.random.PRNGKey(0)
idx = jax.random.randint(key, (R,), 0, N, dtype=jnp.int32)

res = []
for d in (128, 129, 136, 256, 8):
    tab = jnp.ones((N, d), jnp.float32)

    @jax.jit
    def g(t, ix):
        return jnp.take(t, ix, axis=0).sum()

    g(tab, idx).block_until_ready()
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        g(tab, idx).block_until_ready()
        ts.append(time.perf_counter() - t0)
    s = float(np.median(ts))
    res.append({"d": d, "s": round(s, 4), "ns_per_row": round(s / R * 1e9, 2),
                "gbps_logical": round(R * d * 4 / s / 1e9, 1)})
    print(res[-1], flush=True)

open("/root/repo/studies/results/lane129.json", "w").write(
    json.dumps(res, indent=1))

"""Engine-shaped gather probe: [C, W] 2D-index row gathers from an
[N, d] table inside lax.scan, for d in (128, 129, 136, 256). Decides
whether the [e|Q] 129-lane layout taxes the config-#5 slot path, in the
ACCESS PATTERN the engine actually uses (unlike the flat jnp.take probe,
which hit an unrelated XLA cliff at d=128/129)."""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

N = 4_000_000
C, W, NCH = 2048, 32, 300  # 19.7M slot rows per call
key = jax.random.PRNGKey(0)
sc = jax.random.randint(key, (NCH, C, W), 0, N, dtype=jnp.int32)

res = []
for d in (128, 129, 136, 256):
    tab = jax.random.normal(jax.random.PRNGKey(1), (N, d), jnp.float32)

    @jax.jit
    def run(t, sc):
        def body(acc, s):
            rows = t[s]              # [C, W, d]
            return acc + rows.sum(), None
        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), sc)
        return acc

    run(tab, sc).block_until_ready()
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        run(tab, sc).block_until_ready()
        ts.append(time.perf_counter() - t0)
    s = float(np.median(ts))
    nrow = NCH * C * W
    res.append({"d": d, "s": round(s, 4),
                "ns_per_row": round(s / nrow * 1e9, 2),
                "gbps_logical": round(nrow * d * 4 / s / 1e9, 1)})
    print(res[-1], flush=True)

open("/root/repo/studies/results/scan_gather_d.json", "w").write(
    json.dumps(res, indent=1))

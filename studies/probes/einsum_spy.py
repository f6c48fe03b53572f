"""Did bf16 reach the slot-stats einsum on config #5? Spy on jnp.einsum
subscripts + operand dtypes during tracing, 1 iteration, full size."""
import argparse
import sys
from collections import Counter

sys.path.insert(0, "/root/repo")
import jax.numpy as jnp

orig_einsum = jnp.einsum
seen = Counter()


def spy(sub, *ops, **kw):
    if isinstance(sub, str):
        try:
            seen[(sub, tuple(str(o.dtype) for o in ops))] += 1
        except Exception:
            pass
    return orig_einsum(sub, *ops, **kw)


jnp.einsum = spy

import bench
import libfm_tpu.learners.mcmc_vector as mv

mv.jnp.einsum = spy  # same module object, but be explicit

orig_init = mv.MCMCVectorLearner.__init__


def patched(self, *a, **k):
    orig_init(self, *a, **k)
    self._stats_bf16 = True


mv.MCMCVectorLearner.__init__ = patched
args = argparse.Namespace(ratings=3_000_000, iters=1)
r = bench.bench_largevocab(args)
print("s_per_iter:", r["value"], flush=True)
for (sub, dts), cnt in sorted(seen.items()):
    print(f"{cnt:6d}x  {sub:18s} {dts}", flush=True)

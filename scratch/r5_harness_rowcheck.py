import sys
import numpy as np
import jax
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/benchmarks")
print("backend:", jax.default_backend(), flush=True)
import sweep
rng = np.random.default_rng(2)
rows = []
for n in (1 << 13, 1 << 12, 1 << 14):
    sweep._config2_row(rows, rng, n, 1 << 22)
print("DONE", flush=True)

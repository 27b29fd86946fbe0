"""Round-5 probe: why did cfft fwd at 2^13..2^16 DROP vs round 4 while
2^9..2^12 rose, after wiring input_output_aliases + the donated fwd basis?

Distinguishing feature: n1 = N/128 > 32 puts ordered IO OUTSIDE the
kernel (_ordered_in_kernel gate) — the public ordered path is then
aliased-kernel -> XLA _digit_transpose. Hypothesis: same mechanism as the
composite levels (aliased kernel back-to-back with another HBM pass loses
cross-op pipelining, NOTES.md round-5 alias entry).

Cases (interleaved, one process, donated carry, min-of-rounds slope):
  ord  ON/OFF  — full ordered path (_cfft_pair_impl ordered=True)
  unord ON/OFF — raw kernel (_pallas_cfft_pair, natural Stockham layout)
at 2^13 and 2^15, b*n = 2^22.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import chowdsp_fft_tpu as cf  # noqa: F401,E402
from chowdsp_fft_tpu.ops import pallas_fft as pf  # noqa: E402

print("backend:", jax.default_backend(), flush=True)
rng = np.random.default_rng(0)


def make_loop(body, iters):
    @jax.jit
    def loop(v):
        def step(c, _):
            return body(c), None
        c, _ = jax.lax.scan(step, v, None, length=iters)
        return jax.tree_util.tree_map(lambda a: jnp.sum(a * 0.0), c)
    return loop


def build(tag, body, init, pairs):
    lps = [(it, make_loop(body, it)) for it in pairs]
    for _, lp in lps:
        jax.tree_util.tree_map(float, lp(init))
    print(f"  {tag} compiled", flush=True)
    return lps


for e in (13, 15):
    n, b = 1 << e, (1 << 22) >> e
    zr = jax.device_put(rng.standard_normal((b, n)).astype(np.float32))
    zi = jax.device_put(rng.standard_normal((b, n)).astype(np.float32))
    pairs = (16, 272)

    cases = {}
    for alias_on in (True, False):
        pf._ALIAS_KERNELS = alias_on
        a = "ON " if alias_on else "OFF"

        def ord_body(v, n=n):
            return pf._cfft_pair_impl(v[0], v[1], n, pf.FFT_FORWARD, True)

        def unord_body(v, n=n):
            return pf._pallas_cfft_pair(v[0], v[1], n, True, False)

        cases[f"ord   {a}"] = build(f"2^{e} ord   {a}", ord_body, (zr, zi), pairs)
        cases[f"unord {a}"] = build(f"2^{e} unord {a}", unord_body, (zr, zi), pairs)
    pf._ALIAS_KERNELS = True

    best = {k: [float("inf")] * 2 for k in cases}
    for _ in range(4):
        for k, lps in cases.items():
            for j, (_, lp) in enumerate(lps):
                t0 = time.perf_counter()
                jax.tree_util.tree_map(float, lp((zr, zi)))
                best[k][j] = min(best[k][j], time.perf_counter() - t0)
    lo, hi = pairs
    for k in cases:
        t = (best[k][1] - best[k][0]) / (hi - lo) * 1e6
        print(f"2^{e} {k}: {t:.1f} us = {b*n/t:.0f} Ms/s fwd", flush=True)
print("DONE", flush=True)

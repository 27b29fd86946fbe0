"""Roofline model for FFT/convolution kernels on TPU.

BASELINE.json's north star demands roofline proof per kernel; this module
is the calculator. The batched FFT is memory-bound on every TPU
generation (2.5*N*log2(N) flops vs ~12 bytes/sample of HBM traffic), so
the speed of light is HBM bandwidth divided by bytes moved; the merge
matmul's MXU time is reported alongside to show which regime a config is
in.
"""

from __future__ import annotations

import dataclasses
import math

__all__ = ["ChipSpec", "V5E", "fft_roofline", "conv_roofline", "halo_weak_scaling"]


@dataclasses.dataclass(frozen=True)
class ChipSpec:
    name: str
    hbm_bytes_per_s: float
    bf16_flops: float  # peak MXU bf16 FLOP/s
    f32_matmul_flops: float  # legacy MAC-proportional fp32 estimate (see note)
    vpu_flops: float  # fp32 vector FLOP/s
    mxu_rows_per_cycle: float = 8.0  # operand rows the systolic array eats/cycle
    mxu_clock_hz: float = 0.94e9
    f32_passes: int = 6  # fp32-HIGHEST multi-pass emulation depth


# TPU v5e (datasheet: 197 bf16 TFLOP/s, 819 GB/s HBM; VPU 8x128x4 ALUs at
# ~0.94 GHz; ICI ~45 GB/s per direction per link on the 2D torus).
#
# MXU cost model (validated on-chip, round 2 — benchmarks/ROOFLINE.md):
# matmul time = rows x passes / mxu_rows_per_cycle / clock, INDEPENDENT of
# output columns <= 128 and of K <= 128 (K > 128 adds ceil(K/128) passes).
# The legacy f32_matmul_flops (MAC-proportional, 33 TF "effective") is kept
# only for older scripts; fft_roofline below uses the pass model.
V5E = ChipSpec(
    name="v5e",
    hbm_bytes_per_s=819e9,
    bf16_flops=197e12,
    f32_matmul_flops=33e12,
    vpu_flops=3.9e12,
)

V5E_ICI_BYTES_PER_S = 45e9  # per direction per link


@dataclasses.dataclass(frozen=True)
class Roofline:
    seconds_memory: float
    seconds_compute: float
    bound: str
    samples_per_s: float
    n_samples: float = 0.0

    def fraction(self, measured_samples_per_s: float) -> float:
        return measured_samples_per_s / self.samples_per_s

    @property
    def seconds_serial(self) -> float:
        """Serial-phase governing bound: HBM IO + VPU stages + MXU merge
        summed, NOT overlapped. On v5e Mosaic the kernel's IO, butterfly
        (VPU) and merge (MXU) phases measurably do not overlap — the ILP
        sub-tile probe and the pass-model validation (benchmarks/
        ROOFLINE.md, NOTES.md round 2) show each phase at ~0.7-1.0 of its
        own bound with zero cross-phase concurrency — so the achievable
        speed of light is the SUM of the three resource bounds, not their
        max. This is the denominator the re-anchored BASELINE gate uses."""
        return self.seconds_memory + self.seconds_compute

    @property
    def samples_per_s_serial(self) -> float:
        return self.n_samples / self.seconds_serial


# Single-Stockham-kernel ceiling; mirrors ops.pallas_fft._MAX_N (kept as a
# plain constant so utils stays import-light — tests/test_roofline.py pins
# the two in sync).
SINGLE_KERNEL_MAX_N = 131072

# Largest n1 = n/128 whose natural-order IO rides inside the complex
# kernel; above it the engine pays a separate XLA digit-transpose = one
# extra HBM round trip per ordered transform. Pinned equal to
# ops.pallas_fft._ORDERED_IN_KERNEL_MAX_N1 by tests/test_roofline.py.
ORDERED_IN_KERNEL_MAX_N1 = 64
_MAX_DIRECT_N = 511  # mirrors ops.pallas_fft._MAX_SMALL_FALLBACK


def _single_kernel(n: int) -> bool:
    """Mirrors the metal engine's dispatch tier: one kernel for the
    direct-DFT domain (<= 511) and for {2,3,5}-smooth multiples of 128 up
    to the single-kernel ceiling; every other size runs the two-level
    HBM-staged composite (two round trips per direction). Pinned to the
    engine's predicates by tests/test_roofline.py."""
    if n <= _MAX_DIRECT_N:
        return True
    if n > SINGLE_KERNEL_MAX_N or n % 128:
        return False
    m = n // 128
    for p in (2, 3, 5):
        while m % p == 0:
            m //= p
    return m == 1


def fft_roofline(
    n: int,
    batch: int,
    kind: str = "real",
    chip: ChipSpec = V5E,
    merge_lanes: int = 128,
    levels: int | None = None,
    ordered: bool = True,
) -> Roofline:
    """Speed of light for a batched (r)fft of length n.

    Memory: one input read + one output write PER LEVEL — above the
    single-kernel ceiling the engine runs the two-level HBM-staged
    composite (ops/pallas_fft._cfft_composite_v2 and the direct-real
    analog), so the data makes two round trips; ``levels`` defaults to
    the dispatch tier and can be forced for modeling.
    ``ordered`` (complex only): natural bin order above the in-kernel
    reorder gate (n1 > ORDERED_IN_KERNEL_MAX_N1) structurally costs one
    extra HBM round trip — the digit transpose, the TPU analog of
    pffft_zreorder, which the reference's ordered fft_transform likewise
    pays. Measured round 5 (scratch/r5_ordkernel_ab.py): the in-kernel
    shuffle chain grows with n1 and loses to the flat external pass above
    n1=64 (383 vs 299us at 2^14, 641 vs 282 at 2^15), so the reorder trip
    is a hardware law of natural order at these sizes, not an
    implementation artifact. Pass ordered=False for the engine-private
    unordered basis (convolution chains).
    Compute: butterfly flops on the VPU + the four-step merge matmul on
    the MXU, costed by the validated PASS model (rows x passes at
    mxu_rows_per_cycle, column-count-independent): the real forward's
    column-packed merge is 2 fp32-HIGHEST matmuls, complex merges are 3
    (Karatsuba). For the two-level real composite, level 2 is a complex
    transform on the ~n/2 Hermitian-independent bins (half rows, 3
    matmuls).
    """
    if levels is None:
        levels = 1 if _single_kernel(n) else 2
    if kind == "real":
        in_bytes = n * 4
        out_bytes = (n // 2 + 1) * 8
    else:
        in_bytes = n * 8
        out_bytes = n * 8
    t_mem = levels * batch * (in_bytes + out_bytes) / chip.hbm_bytes_per_s
    if kind != "real" and levels >= 2 and n > SINGLE_KERNEL_MAX_N:
        # (Gated to the pallas v2 composite's range, like the real-kind
        # assembly charge below: medium smooth sizes such as 960/3600
        # dispatch to the portable engine, whose pass structure this floor
        # was not measured on — ungated, the published cfft governing
        # fractions exceeded 1.0 there, a provably wrong bound.)
        # HBM-footprint law (measured, round 5: r5_io_floor_probe /
        # r5_stream_probe, benchmarks/NOTES.md): a 2in+2out fp32 kernel
        # whose LIVE in+out pages exceed ~32 MB runs at ~half the duplex
        # rate; <= 32 MB (or outputs aliased onto the input pages) runs at
        # the full duplex bound. The ONE-level complex kernel ships with
        # input_output_aliases and stays un-floored; the composite's level
        # kernels measurably cannot alias (level-2 aliasing costs 5%,
        # r5_alias_ab2.log — the chain loses its L1/L2 pipelining), so
        # each un-aliased level pays the floored rate. This re-derived
        # tier lands within 0.5% of silicon at 2^18 (predicted 506us vs
        # measured 504us fwd, b*n=2^22 — NOTES.md round-5 tier entry).
        live_bytes = 4 * batch * n * 4  # 2 in + 2 out fp32 planes
        if live_bytes > 32 * (1 << 20):
            t_mem *= 2.0
    if (
        kind != "real"
        and levels == 1
        and ordered
        and n // 128 > ORDERED_IN_KERNEL_MAX_N1
    ):
        # Natural-order digit transpose above the in-kernel gate: one
        # extra full-duplex HBM round trip (see ``ordered`` in the
        # docstring). The two-level composite emits natural order through
        # its own structured transpose and is already charged 2 trips.
        t_mem += batch * (in_bytes + out_bytes) / chip.hbm_bytes_per_s
    if kind == "real" and levels >= 2 and ordered and n > SINGLE_KERNEL_MAX_N:
        # (Gated to the pallas v2 real composite's range — the medium
        # smooth sizes, e.g. 960/3600, dispatch to the portable engine
        # whose pass structure this model does not describe.)
        # The real composite's Hermitian assembly is its reorder trip:
        # the level kernels compute only the k1 <= A/2 half-grid, and
        # producing the packed natural-order planes requires one more
        # full pass (XLA rev/concat — the mirror halves are minor-axis
        # reversals, which Mosaic kernels cannot emit in-block). Measured
        # round 5 (scratch/r5_rcomp_phase.py, 2^18 b=16): L1 148.7us +
        # lines 5.6 + L2 103.2 + assembly 79.0 = 336.5 vs 352.6 full —
        # the assembly is a structural ~1 round trip (2x the 39us duplex
        # floor), same class as the complex ordered reorder charge.
        t_mem += batch * (in_bytes + out_bytes) / chip.hbm_bytes_per_s

    row_unit = chip.f32_passes / chip.mxu_rows_per_cycle / chip.mxu_clock_hz
    merge_rows = batch * max(1, n // merge_lanes)
    planes = 1 if kind == "real" else 2  # stage work runs per fp32 plane
    if levels == 1:
        bf_flops = (
            2.5 * planes * n * max(1.0, math.log2(max(2, n // merge_lanes))) * batch
        )
        t_merge = merge_rows * (2 if kind == "real" else 3) * row_unit
    else:
        # balanced split n = a*c (pow2-exact; smooth-N approximate)
        a = 1 << ((n.bit_length()) // 2)
        while n % a:
            a >>= 1
        c = n // a
        la = max(1.0, math.log2(max(2, a // merge_lanes)))
        lc = max(1.0, math.log2(max(2, c // merge_lanes)))
        if kind == "real":
            # level 1: fused real kernel over full n (one plane); level 2:
            # complex (two planes) on the ~n/2 independent bins
            bf_flops = 2.5 * batch * (n * la + 2 * (n / 2) * lc)
            t_merge = (merge_rows * 2 + merge_rows / 2 * 3) * row_unit
        else:
            bf_flops = 2.5 * batch * 2 * n * (la + lc)
            t_merge = merge_rows * 3 * 2 * row_unit
    t_comp = bf_flops / chip.vpu_flops + t_merge

    t = max(t_mem, t_comp)
    return Roofline(
        seconds_memory=t_mem,
        seconds_compute=t_comp,
        bound="memory" if t_mem >= t_comp else "compute",
        samples_per_s=batch * n / t,
        n_samples=batch * n,
    )


def conv_roofline(
    n_fft: int,
    batch_blocks: int,
    chip: ChipSpec = V5E,
) -> Roofline:
    """Speed of light for one overlap-save round (rfft + spectral multiply
    + irfft) per block of n_fft samples: ~3 array reads + 3 writes."""
    bytes_moved = batch_blocks * (
        2 * (n_fft * 4 + (n_fft // 2 + 1) * 8)  # fwd + inv transforms
        + 3 * (n_fft // 2 + 1) * 8  # multiply: read A, H, write
    )
    t_mem = bytes_moved / chip.hbm_bytes_per_s
    fft_r = fft_roofline(n_fft, batch_blocks, "real", chip)
    t_comp = 2 * fft_r.seconds_compute
    t = max(t_mem, t_comp)
    return Roofline(
        seconds_memory=t_mem,
        seconds_compute=t_comp,
        bound="memory" if t_mem >= t_comp else "compute",
        samples_per_s=batch_blocks * n_fft / t,
        n_samples=batch_blocks * n_fft,
    )


def halo_weak_scaling(
    per_device_samples: int,
    taps: int,
    block: int = 1024,
    chip: ChipSpec = V5E,
    ici_bytes_per_s: float = V5E_ICI_BYTES_PER_S,
    overlap_comm: bool = False,
) -> dict:
    """Predicted weak-scaling efficiency of the time-sharded overlap-save
    FIR (parallel.sharded_partitioned_fir) on a real chip ring.

    Each device holds a contiguous time shard and receives a (taps-1)-sample
    float32 halo from its left neighbor via one ppermute hop per
    application — communication volume is independent of device count, so
    the model is device-count-invariant: efficiency = t_comp / (t_comp +
    t_halo) (serial) or min(1, t_comp / max(t_comp, t_halo)) when the halo
    ppermute is overlapped with the first block FFTs. Real multi-chip
    hardware is not available in this environment (single-chip tunnel;
    BASELINE.md), so this model — anchored to the measured single-chip conv
    throughput — stands in for the 2-host measurement; the communication
    *structure* is validated on the virtual CPU mesh by
    tests/test_parallel.py and __graft_entry__.dryrun_multichip.
    """
    n_fft = 2 * block
    blocks = -(-per_device_samples // block)
    t_comp = blocks * n_fft / conv_roofline(n_fft, blocks, chip).samples_per_s
    halo_bytes = (taps - 1) * 4
    t_halo = halo_bytes / ici_bytes_per_s + 1e-6  # + ~1us ppermute latency
    if overlap_comm:
        eff = min(1.0, t_comp / max(t_comp, t_halo))
    else:
        eff = t_comp / (t_comp + t_halo)
    return {
        "per_device_samples": per_device_samples,
        "taps": taps,
        "t_compute_s": t_comp,
        "t_halo_s": t_halo,
        "efficiency": eff,
    }

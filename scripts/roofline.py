"""Speed-of-light accounting for the two hot kernels (VERDICT r2 item 3).

Counts algorithmic FLOPs and minimum HBM bytes for the fused
eigendecomposition stage (`ops/pallas_eig.py`) and the block-Thomas BVP
solve (`ops/pallas_blocktri.py`) at the bench footprint, compares them
with v5e roofline numbers and (optionally) measured times, and prints
the markdown table embedded in docs/performance.md.

v5e peaks used (public chip specs):
- HBM bandwidth:   819 GB/s
- VPU issue rate:  8 x 128 lanes x 4 ALUs x 0.94 GHz = 3.85 T op/s
  (an op is one f32 lane ALU slot; an FMA retires 2 FLOP in 1 op, a
  select/compare/permute retires 0 "useful" FLOP in 1 op)
- MXU (f32 "highest" precision): ~49 TFLOP/s (197 bf16 / 4 passes)

Usage: python scripts/roofline.py [eig_ms] [blocktri_ms] [solve_ms] [cols_per_s]
"""

import sys

HBM_GBPS = 819.0
VPU_OPS = 3.85e12          # lane ALU issue slots / s
F32 = 4

# bench footprint
B = 2048                   # solves per chunk (16 cols x 128 bands)
L = 64                     # layers
N = 16                     # quadrature streams per hemisphere
NF = 1                     # Fourier modes (flux-only)
SWEEPS = 5                 # f32 Jacobi sweeps (ops/jacobi.py, r5 default)


def eig_counts():
    """(useful FLOP, VPU ops, min HBM bytes) per matrix for the fused
    eigen stage (n = N): Cholesky + congruence + Jacobi + 4 back
    transforms.  Ops counted from the kernel structure in
    ops/pallas_eig.py / pallas_jacobi.py."""
    n = N
    e = n * n
    # Cholesky: n fori steps, each ~2 masked extractions (2 passes of e
    # ops), rank-1 update (2e ops = e FLOP mul + e FLOP sub), scale col
    chol_ops = n * (2 * e + 2 * e + 2 * n)
    chol_flop = n * (2 * e + 2 * n)          # rank-1 FMA + col scale
    # congruence M = L^T (-At) L: two n-step FMA contractions
    cong_flop = 2 * (2 * n ** 3)
    cong_ops = cong_flop / 2                 # pure FMA
    # ONE-SIDED Jacobi on rows of chol(M) (r5 default): per round
    # 2 row-FMA passes (C, V^T; 3 FLOP/elem, 2 ops with FMA),
    # 2 permute-concats (2e ops, 0 FLOP), Gram dot (mult e + reduce e),
    # pivot math (~30n/2); plus the extra Cholesky of M (counted via
    # chol_* twice below is NOT done — add its ops here once) and the
    # final row-norm reduction.
    rounds = (n - 1) * SWEEPS
    jac_flop = rounds * (2 * 3 * e + e + 15 * (n // 2)) \
        + n * (2 * e + 2 * n) + 2 * e
    jac_ops = rounds * (2 * 2 * e + 2 * e + 2 * e + 20 * (n // 2)) \
        + n * (4 * e + 2 * n) + 2 * e
    # back transforms: trisolve (n steps x (2 extract passes + FMA-sum
    # pass + div)), LZ + P contractions (2n^3 FLOP each), Y & Q scales
    tri_flop = n * (2 * n + n * n)           # ~n^3
    tri_ops = n * (2 * e + e + n)
    back_flop = tri_flop + 2 * (2 * n ** 3) + 2 * e
    back_ops = tri_ops + 2 * (n ** 3) + 2 * e
    flop = chol_flop + cong_flop + jac_flop + back_flop
    ops = chol_ops + cong_ops + jac_ops + back_ops
    # min HBM: read At, Bt; write K + 4 n x n outputs (all lanes layout,
    # zero padding)
    bytes_min = (2 * e + n + 4 * e) * F32
    return flop, ops, bytes_min


def blocktri_counts():
    """Per (layer, lane): the r5 H-carry fused kernel — no-swap pivoted
    Gauss-Jordan on the (2N, 3N+1) augmented block [dhat | E_r | rhs],
    the factored correction matmuls, and the G-streaming back
    substitution (ops/pallas_blocktri.py)."""
    n = 2 * N
    half = N
    m = n + half + 1                         # aug width 3N+1 (was 4N+1)
    # correction: A = low_top (N x n) @ H (n x N), corr_d = A @ u_bot
    # (N x n), corr_r matvec — about half the old (n x n)(n x (n+1))
    corr_flop = 2 * half * n * half + 2 * half * half * n + 2 * half * n
    corr_ops = corr_flop / 2
    # no-swap GJ: n steps; per step ~3 masked passes over (n, m)
    # (extract colk, pivot_row sum, fused FMA+select) + rank-1
    # elimination FLOP (2 n*m) + pivot divide (m); final one-hot
    # un-permutation matmul over the (n, N+1) solution block
    gj_flop = n * (2 * n * m + m) + 2 * n * n * (half + 1)
    gj_ops = n * (3 * n * m + n * m + m) + n * n * (half + 1)
    # backward substitution: v = u_bot @ x (N x n), x = g - H v (n x N)
    bwd_flop = 2 * half * n + 2 * n * half
    bwd_ops = bwd_flop / 2 + half * n        # + u_bot assembly pass
    flop = corr_flop + gj_flop + bwd_flop
    ops = corr_ops + gj_ops + bwd_ops
    # min HBM per (layer, lane): fwd reads G (n^2) + decay (N) + rhs
    # (n), writes H (n N) + g (n); bwd reads H + g + G + decay again,
    # writes x (n)
    bytes_min = (
        (n * n + half + n + n * half + n)
        + (n * half + n + n * n + half + n)
    ) * F32
    return flop, ops, bytes_min


def row(name, flop, ops, bytes_min, count, meas_ms):
    t_hbm = bytes_min * count / (HBM_GBPS * 1e9) * 1e3
    t_vpu = ops * count / VPU_OPS * 1e3
    sol = max(t_hbm, t_vpu)
    out = [
        name,
        f"{flop * count / 1e9:.1f}",
        f"{ops * count / 1e9:.1f}",
        f"{bytes_min * count / 1e6:.0f}",
        f"{t_hbm:.1f}",
        f"{t_vpu:.1f}",
    ]
    if meas_ms:
        eff = flop * count / (meas_ms * 1e-3) / 1e12
        out += [f"{meas_ms:.1f}", f"{sol / meas_ms:.2f}",
                f"{eff:.2f}"]
    else:
        out += ["-", "-", "-"]
    print("| " + " | ".join(out) + " |")


def main():
    args = [float(a) for a in sys.argv[1:]]
    eig_ms = args[0] if len(args) > 0 else None
    bt_ms = args[1] if len(args) > 1 else None
    solve_ms = args[2] if len(args) > 2 else None
    cols_per_s = args[3] if len(args) > 3 else None

    print("| kernel | GFLOP | G-ops | min HBM MB | t_HBM ms | t_VPU ms "
          "| measured ms | SoL frac | eff TFLOP/s |")
    print("|---|---|---|---|---|---|---|---|---|")
    ef, eo, eb = eig_counts()
    row("fused eig stage", ef, eo, eb, B * L * NF, eig_ms)
    bf, bo, bb = blocktri_counts()
    row("block-Thomas BVP", bf, bo, bb, B * L * NF, bt_ms)

    if solve_ms:
        total_flop = (ef + bf) * B * L * NF
        print(f"\nwhole solve: {total_flop/1e9:.1f} algorithmic GFLOP, "
              f"measured {solve_ms:.1f} ms -> "
              f"{total_flop/(solve_ms*1e-3)/1e12:.2f} effective TFLOP/s")
    if cols_per_s:
        per_col_flop = (ef + bf) * L * 128
        print(f"headline: {cols_per_s:.1f} cols/s x {per_col_flop/1e9:.2f} "
              f"GFLOP/col = {cols_per_s*per_col_flop/1e12:.2f} TFLOP/s "
              f"achieved on kernel work")


if __name__ == "__main__":
    main()

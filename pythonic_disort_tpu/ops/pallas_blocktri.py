"""Pallas TPU kernels: block-Thomas solve, VMEM-resident elimination.

The jnp lanes block-tridiagonal path (`ops/blocktri.py`) runs the
64-layer forward recursion as a `lax.scan` whose per-layer Gauss-Jordan
is a 2N-step `fori_loop` of elementwise HBM ops — ~2048 sequential
HBM roundtrips for the bench config (measured ~394 ms per 2048-solve
chunk on a v5e).  These kernels keep each layer's elimination entirely
in VMEM:

- grid = (lane_blocks, L) with the layer axis iterating fastest, so for
  a fixed lane block the L steps run back-to-back while the carried
  recursion state (``W_prev``, ``g_prev`` — the block-Thomas
  elimination factors) lives in VMEM scratch across grid steps;
- per step, one ``(n, n, blk)`` block of each operand is DMA'd in, the
  pivoted Gauss-Jordan runs fully unrolled on VMEM values (static row
  indices everywhere except the per-lane pivot argmax), and the layer's
  ``W``/``g`` factors are written out once;
- back-substitution is a second kernel with the layer index map
  reversed, carrying ``x_next`` in scratch.

Pivoting matches the jnp path: per-lane partial pivoting via argmax +
one-hot row extraction/swap (strongly peaked phase functions make
unpivoted elimination break down — see `ops/blocktri.py`).

The PRODUCTION path is `solve_bvp_fused` (r5): assembly fused in-kernel
from G/decay (nothing but the eigenvector blocks touches HBM), the
H-carry factorization of the structurally-zero upper block (elimination
width 3N+1 instead of 4N+1, carried stack halved), and a no-swap
Gauss-Jordan on a TRANSPOSED VMEM scratch whose pivot-column reads are
axis-0 dynamic slices (54.4 -> 16.8 ms at the 2048-lane bench
footprint across r4 -> r5).  The generic `solve_block_tridiag_lanes_
pallas` below keeps the original row-major swap formulation and serves
as the A/B fallback and the custom-vjp backward solver.

HBM traffic for the bench config drops from ~2048 passes to: read the
four operands once, write+read the (L, n, n, B) ``W`` stack, write
``x`` — ~2.7 GB ≈ 3.5 ms of v5e bandwidth, with the elimination compute
(~40 GFLOP of VPU work) the new bound.

float32 only (Mosaic has no f64); float64 callers stay on the jnp path.
Replaces the role of the reference's banded LAPACK solve
(reference ``_solve_for_coeffs.py:326-333``).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lane_block(n):
    # VMEM working set per step ~ (3 inputs + W out + aug + scratch) x
    # (n x ~2n x blk x 4B), double-buffered; keep it well under 16 MB.
    return 256 if n <= 16 else 128


def _gauss_jordan_vmem(a, n, m):
    """Pivoted Gauss-Jordan on ``a`` (n, n+m, blk), ``fori_loop`` body.

    Returns the reduced augmented block; columns [n:] hold the solution.
    Same algorithm as ``blocktri.gauss_jordan_solve_lanes`` but on VMEM
    values.  The elimination loop is a ``lax.fori_loop`` whose traced
    index ``k`` is materialized through iota-compare masked selects and
    masked-sum row/column extraction (Mosaic supports neither scatters
    nor cheap dynamic sublane slices; a fully unrolled version of this
    loop costs ~400 s of Mosaic compile time at identical runtime).
    """
    blk = a.shape[-1]
    dtype = a.dtype
    row2 = lax.broadcasted_iota(jnp.int32, (n, blk), 0)           # (n, blk)
    row3 = lax.broadcasted_iota(jnp.int32, (n, n + m, blk), 0)
    col3 = lax.broadcasted_iota(jnp.int32, (n, n + m, blk), 1)
    cols2 = lax.broadcasted_iota(jnp.int32, (n + m, blk), 0)
    neg_inf = jnp.asarray(-jnp.inf, dtype)
    zero = jnp.zeros((), dtype)

    def body(k, a):
        isk3 = row3 == k                                    # (n, n+m, blk)
        colk = jnp.sum(jnp.where(col3 == k, a, zero), axis=1)   # (n, blk)
        cand = jnp.where(row2 >= k, jnp.abs(colk), neg_inf)
        r = lax.argmax(cand, axis=0, index_dtype=jnp.int32)      # (blk,)
        onehot = row2 == r[None, :]                         # (n, blk)
        pivot_row = jnp.sum(
            jnp.where(onehot[:, None, :], a, zero), axis=0
        )                                                   # (n+m, blk)
        rowk = jnp.sum(jnp.where(isk3, a, zero), axis=0)    # (n+m, blk)
        pv = jnp.sum(jnp.where(cols2 == k, pivot_row, zero), axis=0)  # (blk,)
        piv = pivot_row / pv[None, :]                       # (n+m, blk)
        # Swap + eliminate fused algebraically: after swapping rows
        # (k <-> r), column k reads colk except colk[r] = colk[k], so
        #   i not in {k, r}: a[i] - colk[i] piv
        #   i = r:           rowk - colk[k] piv   (old row k, its colk entry)
        #   i = k:           piv
        # — one FMA pass + two selects instead of two swap passes, a
        # second column extraction, an FMA and a select.
        ck_k = jnp.sum(jnp.where(row2 == k, colk, zero), axis=0)      # (blk,)
        a = a - colk[:, None, :] * piv[None]
        row_r = rowk - ck_k[None, :] * piv                  # (n+m, blk)
        a = jnp.where(onehot[:, None, :], row_r[None], a)
        a = jnp.where(isk3, piv[None], a)
        return a

    return lax.fori_loop(jnp.int32(0), jnp.int32(n), body, a)


def _matmul_lanes_unrolled(A, X, n):
    """(n, n, blk) x (n, m, blk) -> (n, m, blk), k-loop on the VPU."""
    acc = A[:, 0, :][:, None, :] * X[0][None]
    for k in range(1, n):
        acc = acc + A[:, k, :][:, None, :] * X[k][None]
    return acc


def _fwd_kernel(lower_ref, diag_ref, upper_ref, rhs_ref, W_ref, g_ref,
                Wprev, gprev, *, n):
    l = pl.program_id(1)

    D = diag_ref[0]                                         # (n, n, blk)
    U = upper_ref[0]
    r = rhs_ref[0]                                          # (n, blk)
    Low = lower_ref[0]

    @pl.when(l == 0)
    def _():
        Wprev[...] = jnp.zeros_like(Wprev)
        gprev[...] = jnp.zeros_like(gprev)

    # lower[0] is ignored by convention and may hold arbitrary values;
    # zero it on the first step so 0 * garbage cannot produce NaNs.
    Low = jnp.where(l == 0, jnp.zeros_like(Low), Low)

    Wp = Wprev[...]
    gp = gprev[...]
    aug_prev = jnp.concatenate([Wp, gp[:, None, :]], axis=1)  # (n, n+1, blk)
    corr = _matmul_lanes_unrolled(Low, aug_prev, n)
    dhat = D - corr[:, :n, :]
    rhat = r - corr[:, n, :]

    aug = jnp.concatenate([dhat, U, rhat[:, None, :]], axis=1)  # (n, 2n+1, blk)
    sol = _gauss_jordan_vmem(aug, n, n + 1)[:, n:, :]

    W = sol[:, :n, :]
    g = sol[:, n, :]
    W_ref[0] = W
    g_ref[0] = g
    Wprev[...] = W
    gprev[...] = g


def _bwd_kernel(W_ref, g_ref, x_ref, xnext, *, n):
    step = pl.program_id(1)                     # 0 -> layer L-1 (reversed map)

    g = g_ref[0]                                            # (n, blk)

    @pl.when(step == 0)
    def _():
        xnext[...] = jnp.zeros_like(xnext)

    # W[L-1] multiplies x_next which is zero on the last layer, but it
    # was eliminated against upper[L-1] (ignored by convention, possibly
    # garbage): mask W rather than rely on 0 * garbage == 0.
    W = jnp.where(step == 0, jnp.zeros_like(W_ref[0]), W_ref[0])
    xn = xnext[...]
    acc = g
    for k in range(n):
        acc = acc - W[:, k, :] * xn[k][None, :]
    x_ref[0] = acc
    xnext[...] = acc


def _gj_noswap_ref_vmem(aug_ref, n, m):
    """No-swap pivoted Gauss-Jordan on a TRANSPOSED scratch ref.

    ``aug_ref``: VMEM scratch of shape (n+m, n, blk) holding the
    augmented system column-major (columns on axis 0).  The pivot
    COLUMN read then is a cheap axis-0 dynamic slice instead of a
    full-tensor masked reduction — the dominant extraction pass of the
    r4 row-major formulation drops to an (n, blk) plane read.  No
    physical row swaps: the per-lane pivot row stays in place (same
    pivot sequence as swap-based partial pivoting — swapping only
    relabels rows) and a carried permutation un-scrambles the solution
    once at the end.  Per step: one masked pivot-row reduction + one
    fused FMA/select read-modify-write of the ref.  Returns the
    solution columns (m, n, blk) in true row order.
    """
    blk = aug_ref.shape[-1]
    dtype = aug_ref.dtype
    row2 = lax.broadcasted_iota(jnp.int32, (n, blk), 0)        # row ids
    rows3 = lax.broadcasted_iota(jnp.int32, (n + m, n, blk), 1)
    neg_inf = jnp.asarray(-jnp.inf, dtype)
    zero = jnp.zeros((), dtype)

    def body(k, carry):
        used, perm = carry
        colk = aug_ref[pl.ds(k, 1)][0]                         # (n, blk)
        cand = jnp.where(used == 0, jnp.abs(colk), neg_inf)
        r = lax.argmax(cand, axis=0, index_dtype=jnp.int32)    # (blk,)
        onehot3 = rows3 == r[None, None, :]
        a = aug_ref[...]
        pivot_row = jnp.sum(jnp.where(onehot3, a, zero), axis=1)  # (n+m, blk)
        pv = jnp.sum(jnp.where(row2 == r[None, :], colk, zero), axis=0)
        piv = pivot_row / pv[None, :]                          # (n+m, blk)
        aug_ref[...] = jnp.where(
            onehot3,
            piv[:, None, :],
            a - piv[:, None, :] * colk[None, :, :],
        )
        used = jnp.where(row2 == r[None, :], jnp.int32(1), used)
        perm = jnp.where(row2 == k, r[None, :], perm)
        return used, perm

    _, perm = lax.fori_loop(
        jnp.int32(0),
        jnp.int32(n),
        body,
        (jnp.zeros((n, blk), jnp.int32), jnp.zeros((n, blk), jnp.int32)),
    )
    sol = aug_ref[pl.ds(n, m)]                                 # (m, n, blk)
    # sol[:, i] is the solution row for variable k where perm[k] = i:
    # true[:, k] = sol[:, perm[k]] -> one-hot contraction over axis 1
    PK = (perm[None, :, :] == lax.broadcasted_iota(
        jnp.int32, (n, n, blk), 0)[:, :, :]).astype(dtype)     # (i, k, blk)
    acc = sol[:, 0, :][:, None, :] * PK[0][None]
    for i in range(1, n):
        acc = acc + sol[:, i, :][:, None, :] * PK[i][None]
    return acc                                                 # (m, n, blk) true order


def _fused_fwd_kernel(g_ref, d_ref, bt_ref, rhs_ref, H_ref, gv_ref,
                      Gc, dc, Gp, dp, Hprev, gprev, augS, *, n2, L):
    """Forward block-Thomas with the BVP block assembly fused in.

    Grid (nb, L+1), delayed one step: grid step ``t`` eliminates layer
    ``l = t-1`` using G[l-1] / G[l] from VMEM scratch carries, building
    the lower/diag blocks on the fly (the XLA assembly materialized ~5
    full (L, 2N, 2N, NFS) tensors in HBM; here only G and the decays
    are read).  Block structure (see `blocktri.assemble_bvp_blocks`):

      Mtop_l = [G_l[:, :N] * decay_l | G_l[:, N:]]
      Mbot_l = [G_l[:, :N] | G_l[:, N:] * decay_l]
      D_l    = [ (+ if l==0 else -) Mbot_l[N:] ;
                 Mtop_l[:N] if l < L-1 else bt_rows ]
      Low_l  = [ Mtop_{l-1}[N:] ; 0 ]      (0 for l == 0)
      U_l    = [ 0 ; -Mbot_{l+1}[:N] ]     (0 for l == L-1)

    H-carry: because U_l's top half is structurally ZERO, the Thomas
    carry W_l = dhat_l^-1 U_l factors as H_l u_bot_l with
    H_l := dhat_l^-1 [0; I_N] (the right N columns of the inverse,
    (2N, N)) and u_bot_l = -Mbot_{l+1}[:N].  Carrying/storing H instead
    of W (i) shrinks the Gauss-Jordan augmentation from
    [dhat | U | rhs] (4N+1 wide) to [dhat | E_r | rhs] (3N+1) — 25%
    fewer elimination FMAs and extraction-pass elements — and (ii)
    halves the carried-stack HBM traffic ((L, 2N, N, B) vs
    (L, 2N, 2N, B)).  The layer correction becomes
    Low_l W_{l-1} = (low_top_l H_{l-1}) u_bot_{l-1}, two N-deep lane
    matmuls at the same FLOP count as the old one.
    """
    t = pl.program_id(1)
    n = n2 // 2
    Gn = g_ref[0]                                           # (2N, 2N, blk)
    dn = d_ref[0]                                           # (N, blk)

    @pl.when(t == 0)
    def _():
        Gc[...] = Gn
        dc[...] = dn
        Gp[...] = jnp.zeros_like(Gp)
        dp[...] = jnp.zeros_like(dp)
        Hprev[...] = jnp.zeros_like(Hprev)
        gprev[...] = jnp.zeros_like(gprev)

    @pl.when(t > 0)
    def _():
        l = t - 1
        Gl = Gc[...]
        dl = dc[...][None, :, :]                            # cols :N scale
        Gm = Gp[...]
        dm = dp[...][None, :, :]
        r = rhs_ref[0]                                      # (2N, blk)

        # dtype-typed constants: f64 literals under global x64 trace to
        # an f64 select, which Mosaic cannot legalize
        one = jnp.ones((), Gl.dtype)
        sign = jnp.where(l == 0, one, -one)
        d_top = sign * jnp.concatenate(
            [Gl[n:, :n, :], Gl[n:, n:, :] * dl], axis=1
        )                                                   # (N, 2N, blk)
        mtop_l = jnp.concatenate(
            [Gl[:n, :n, :] * dl, Gl[:n, n:, :]], axis=1
        )
        d_bot = jnp.where(l == L - 1, bt_ref[...], mtop_l)
        D = jnp.concatenate([d_top, d_bot], axis=0)         # (2N, 2N, blk)

        # correction from the previous layer: Low rows are only the
        # TOP half (Mtop_{l-1}[N:]); bottom rows of Low are zero.
        low_top = jnp.where(
            l == 0,
            jnp.zeros_like(Gm[n:]),
            jnp.concatenate([Gm[n:, :n, :] * dm, Gm[n:, n:, :]], axis=1),
        )                                                   # (N, 2N, blk)
        # u_bot_{l-1} = -Mbot_l[:N], built from the CURRENT layer's G
        ub_prev = -jnp.concatenate(
            [Gl[:n, :n, :], Gl[:n, n:, :] * dl], axis=1
        )                                                   # (N, 2N, blk)
        A = _matmul_lanes_unrolled(low_top, Hprev[...], n2)       # (N, N, blk)
        corr_d = _matmul_lanes_unrolled(A, ub_prev, n)            # (N, 2N, blk)
        corr_r = _matmul_lanes_unrolled(
            low_top, gprev[...][:, None, :], n2
        )[:, 0, :]                                          # (N, blk)
        dhat = jnp.concatenate([D[:n] - corr_d, D[n:]], axis=0)
        rhat = jnp.concatenate([r[:n] - corr_r, r[n:]], axis=0)

        # E_r^T = [0; I_N]^T: er_t[j, i] = (i == j + n)
        blk = Gl.shape[-1]
        rj = lax.broadcasted_iota(jnp.int32, (n, n2, blk), 0)
        ci = lax.broadcasted_iota(jnp.int32, (n, n2, blk), 1)
        er_t = (ci == rj + n).astype(Gl.dtype)

        # column-major augmented system in the scratch ref: the GJ's
        # pivot-column reads become axis-0 dynamic slices
        augS[...] = jnp.concatenate(
            [jnp.swapaxes(dhat, 0, 1), er_t, rhat[None]], axis=0
        )                                                   # (2N+N+1, 2N, blk)
        solT = _gj_noswap_ref_vmem(augS, n2, n + 1)         # (N+1, 2N, blk)
        H = jnp.swapaxes(solT[:n], 0, 1)                    # (2N, N, blk)
        gv = solT[n]
        H_ref[0] = H
        gv_ref[0] = gv
        Hprev[...] = H
        gprev[...] = gv
        Gp[...] = Gl
        dp[...] = dc[...]
        Gc[...] = Gn
        dc[...] = dn


def _fused_bwd_kernel(H_ref, g_ref, gr_ref, dr_ref, x_ref,
                      xnext, Gtop_c, d_c, *, n2):
    """Back-substitution for the H-carry scheme (reversed layer map).

    x_l = g_l - H_l (u_bot_l x_{l+1}), with
    u_bot_l = -[G_{l+1}[:N, :N] | G_{l+1}[:N, N:] decay_{l+1}] built
    from the carried top rows of the PREVIOUS (reversed) step's G
    block — so the kernel streams G/decay a second time instead of a
    (L, 2N, 2N, B) W stack: same traffic, half the forward-kernel
    writes.
    """
    step = pl.program_id(1)                     # 0 -> layer L-1
    n = n2 // 2
    g = g_ref[0]                                            # (2N, blk)
    Gcur = gr_ref[0]                                        # (2N, 2N, blk)
    dcur = dr_ref[0]                                        # (N, blk)

    @pl.when(step == 0)
    def _():
        x_ref[0] = g
        xnext[...] = g
        Gtop_c[...] = Gcur[:n]
        d_c[...] = dcur

    @pl.when(step > 0)
    def _():
        Gt_c = Gtop_c[...]                                  # (N, 2N, blk)
        ub = -jnp.concatenate(
            [Gt_c[:, :n, :], Gt_c[:, n:, :] * d_c[...][None]], axis=1
        )                                                   # (N, 2N, blk)
        xn = xnext[...]
        v = _matmul_lanes_unrolled(ub, xn[:, None, :], n2)[:, 0, :]   # (N, blk)
        x = g - _matmul_lanes_unrolled(H_ref[0], v[:, None, :], n)[:, 0, :]
        x_ref[0] = x
        xnext[...] = x
        Gtop_c[...] = Gcur[:n]
        d_c[...] = dcur


def solve_bvp_fused_pallas(Gt, decay_t, bt_rows, rhs_t):
    """Block-Thomas solve with in-kernel BVP assembly.

    Args: ``Gt`` (L, 2N, 2N, B) eigenvector blocks; ``decay_t``
    (L, N, B) homogeneous decay factors; ``bt_rows`` (N, 2N, B) the
    BDRF-corrected bottom boundary rows; ``rhs_t`` (L, 2N, B).
    Returns ``x`` (L, 2N, B).  Same result as assembling
    lower/diag/upper in XLA and calling
    `solve_block_tridiag_lanes_pallas` (asserted by tests), without
    materializing the three (L, 2N, 2N, B) operands in HBM.
    """
    L, n2, _, B = Gt.shape
    n = n2 // 2
    dtype = Gt.dtype
    blk = _lane_block(n2)
    Bp = ((B + blk - 1) // blk) * blk
    if Bp != B:
        pad = Bp - B
        # Pad with G = I, decay = 1: the assembled diagonal is then the
        # well-conditioned permuted identity [[0, -I], [I, 0]] in the
        # padded lanes (decay = 0 would make every non-terminal
        # diagonal block singular and fill the dead lanes with Inf/NaN,
        # tripping nan-guard infrastructure even though the lanes are
        # sliced off).
        Gt = jnp.concatenate(
            [Gt, jnp.broadcast_to(
                jnp.eye(n2, dtype=dtype)[None, :, :, None], (L, n2, n2, pad)
            )], axis=-1)
        decay_t = jnp.concatenate(
            [decay_t, jnp.ones((L, n, pad), dtype)], axis=-1)
        bt_rows = jnp.concatenate(
            [bt_rows,
             jnp.broadcast_to(jnp.eye(n, n2, dtype=dtype)[:, :, None],
                              (n, n2, pad))], axis=-1)
        rhs_t = jnp.concatenate(
            [rhs_t, jnp.zeros((L, n2, pad), dtype)], axis=-1)

    nb = Bp // blk
    z = np.int32(0)
    Lc = np.int32(L - 1)

    def g_spec():
        # at grid step t present G[min(t, L-1)] (t = l+1)
        return pl.BlockSpec(
            (1, n2, n2, blk),
            lambda i, t: (jnp.minimum(t, Lc), z, z, i),
            memory_space=pltpu.VMEM,
        )

    def d_spec():
        return pl.BlockSpec(
            (1, n, blk), lambda i, t: (jnp.minimum(t, Lc), z, i),
            memory_space=pltpu.VMEM,
        )

    def out_h_spec():
        # write layer l = max(t-1, 0)
        return pl.BlockSpec(
            (1, n2, n, blk),
            lambda i, t: (jnp.maximum(t - 1, 0), z, z, i),
            memory_space=pltpu.VMEM,
        )

    def out_vec_spec():
        return pl.BlockSpec(
            (1, n2, blk), lambda i, t: (jnp.maximum(t - 1, 0), z, i),
            memory_space=pltpu.VMEM,
        )

    bt_spec = pl.BlockSpec((n, n2, blk), lambda i, t: (z, z, i),
                           memory_space=pltpu.VMEM)

    H, g = pl.pallas_call(
        functools.partial(_fused_fwd_kernel, n2=n2, L=L),
        grid=(nb, L + 1),
        in_specs=[g_spec(), d_spec(), bt_spec, out_vec_spec()],
        out_specs=[out_h_spec(), out_vec_spec()],
        out_shape=[
            jax.ShapeDtypeStruct((L, n2, n, Bp), dtype),
            jax.ShapeDtypeStruct((L, n2, Bp), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((n2, n2, blk), dtype),   # Gc
            pltpu.VMEM((n, blk), dtype),        # dc
            pltpu.VMEM((n2, n2, blk), dtype),   # Gp
            pltpu.VMEM((n, blk), dtype),        # dp
            pltpu.VMEM((n2, n, blk), dtype),    # Hprev
            pltpu.VMEM((n2, blk), dtype),       # gprev
            pltpu.VMEM((n2 + n + 1, n2, blk), dtype),   # augS (transposed GJ)
        ],
    )(Gt, decay_t, bt_rows, rhs_t)

    def rev_spec(shape):
        # shape includes the leading per-step layer dim of 1
        if len(shape) == 4:
            return pl.BlockSpec(
                shape,
                lambda i, l, L=np.int32(L): (L - 1 - l, z, z, i),
                memory_space=pltpu.VMEM,
            )
        return pl.BlockSpec(
            shape,
            lambda i, l, L=np.int32(L): (L - 1 - l, z, i),
            memory_space=pltpu.VMEM,
        )

    x = pl.pallas_call(
        functools.partial(_fused_bwd_kernel, n2=n2),
        grid=(nb, L),
        in_specs=[
            rev_spec((1, n2, n, blk)),      # H stack
            rev_spec((1, n2, blk)),         # g stack
            rev_spec((1, n2, n2, blk)),     # G (streamed again)
            rev_spec((1, n, blk)),          # decay
        ],
        out_specs=rev_spec((1, n2, blk)),
        out_shape=jax.ShapeDtypeStruct((L, n2, Bp), dtype),
        scratch_shapes=[
            pltpu.VMEM((n2, blk), dtype),       # xnext
            pltpu.VMEM((n, n2, blk), dtype),    # Gtop carry
            pltpu.VMEM((n, blk), dtype),        # decay carry
        ],
    )(H, g, Gt, decay_t)
    return x[..., :B]


@jax.custom_vjp
def solve_bvp_fused(Gt, decay_t, bt_rows, rhs_t):
    """Differentiable front of `solve_bvp_fused_pallas`.

    Forward is the fused Pallas kernel (assembly + block Thomas in
    VMEM); reverse-mode materializes the equivalent lower/diag/upper
    blocks via `blocktri.assemble_bvp_blocks` (shared with the XLA
    path), solves the transposed system, and pulls the block
    cotangents back through the (bi)linear assembly with ``jax.vjp`` —
    so ``grad`` through the production batched solve works on TPU/f32
    where the fused kernel is the default.
    """
    return solve_bvp_fused_pallas(Gt, decay_t, bt_rows, rhs_t)


def _bvp_fused_vjp_fwd(Gt, decay_t, bt_rows, rhs_t):
    x = solve_bvp_fused_pallas(Gt, decay_t, bt_rows, rhs_t)
    return x, (Gt, decay_t, bt_rows, x)


def _bvp_fused_vjp_bwd(res, ct):
    from .blocktri import assemble_bvp_blocks, solve_block_tridiag_lanes

    Gt, decay_t, bt_rows, x = res
    (lower_t, diag_t, upper_t), vjp_asm = jax.vjp(
        assemble_bvp_blocks, Gt, decay_t, bt_rows
    )
    T = lambda m: jnp.swapaxes(m, 1, 2)
    zero = jnp.zeros_like(diag_t[:1])
    lower_T = jnp.concatenate([zero, T(upper_t)[:-1]], axis=0)
    upper_T = jnp.concatenate([T(lower_t)[1:], zero], axis=0)
    y = solve_block_tridiag_lanes(lower_T, T(diag_t), upper_T, ct)
    zero_x = jnp.zeros_like(x[:1])
    x_prev = jnp.concatenate([zero_x, x[:-1]], axis=0)
    x_next = jnp.concatenate([x[1:], zero_x], axis=0)
    outer = lambda a, b: a[:, :, None, :] * b[:, None, :, :]
    dG, dd, db = vjp_asm(
        (-outer(y, x_prev), -outer(y, x), -outer(y, x_next))
    )
    return dG, dd, db, y


solve_bvp_fused.defvjp(_bvp_fused_vjp_fwd, _bvp_fused_vjp_bwd)


def solve_block_tridiag_lanes_pallas(lower_t, diag_t, upper_t, rhs_t):
    """Block-Thomas solve in lanes layout.

    Args: ``lower_t/diag_t/upper_t``: (L, n, n, B); ``rhs_t``: (L, n, B).
    Returns ``x``: (L, n, B).  B is padded internally to the lane block.
    """
    L, n, _, B = diag_t.shape
    dtype = diag_t.dtype
    blk = _lane_block(n)
    Bp = ((B + blk - 1) // blk) * blk
    if Bp != B:
        pad = Bp - B
        eye = jnp.broadcast_to(
            jnp.eye(n, dtype=dtype)[None, :, :, None], (L, n, n, pad)
        )
        zmat = jnp.zeros((L, n, n, pad), dtype)
        zvec = jnp.zeros((L, n, pad), dtype)
        lower_t = jnp.concatenate([lower_t, zmat], axis=-1)
        diag_t = jnp.concatenate([diag_t, eye], axis=-1)
        upper_t = jnp.concatenate([upper_t, zmat], axis=-1)
        rhs_t = jnp.concatenate([rhs_t, zvec], axis=-1)

    nb = Bp // blk
    z = np.int32(0)

    def mat_spec(reverse=False):
        if reverse:
            return pl.BlockSpec(
                (1, n, n, blk),
                lambda i, l, L=np.int32(L): (L - 1 - l, z, z, i),
                memory_space=pltpu.VMEM,
            )
        return pl.BlockSpec(
            (1, n, n, blk), lambda i, l: (l, z, z, i),
            memory_space=pltpu.VMEM,
        )

    def vec_spec(reverse=False):
        if reverse:
            return pl.BlockSpec(
                (1, n, blk),
                lambda i, l, L=np.int32(L): (L - 1 - l, z, i),
                memory_space=pltpu.VMEM,
            )
        return pl.BlockSpec(
            (1, n, blk), lambda i, l: (l, z, i), memory_space=pltpu.VMEM,
        )

    W, g = pl.pallas_call(
        functools.partial(_fwd_kernel, n=n),
        grid=(nb, L),
        in_specs=[mat_spec(), mat_spec(), mat_spec(), vec_spec()],
        out_specs=[mat_spec(), vec_spec()],
        out_shape=[
            jax.ShapeDtypeStruct((L, n, n, Bp), dtype),
            jax.ShapeDtypeStruct((L, n, Bp), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((n, n, blk), dtype),
            pltpu.VMEM((n, blk), dtype),
        ],
    )(lower_t, diag_t, upper_t, rhs_t)

    x = pl.pallas_call(
        functools.partial(_bwd_kernel, n=n),
        grid=(nb, L),
        in_specs=[mat_spec(reverse=True), vec_spec(reverse=True)],
        out_specs=vec_spec(reverse=True),
        out_shape=jax.ShapeDtypeStruct((L, n, Bp), dtype),
        scratch_shapes=[pltpu.VMEM((n, blk), dtype)],
    )(W, g)
    return x[..., :B]

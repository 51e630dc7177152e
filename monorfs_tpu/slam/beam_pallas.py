"""Pallas TPU kernel for the batched association beam scan.

The set-log-likelihood beam (association.py) is the largest single cost of
the PHD SLAM step: a sequential scan over measurements where each step
expands every beam hypothesis by C+1 options and keeps the top B. Under XLA
each scan step is a separate fused computation over tiny arrays, so step
dispatch and HBM round-trips dominate. This kernel runs the WHOLE scan for
ALL particles in one pallas_call with the beam state (scores + packed
used-landmark bitmask words) resident in registers/VMEM.

Layout: particles ride the 128-wide lane axis ([*, P] arrays, P padded to a
lane multiple); the beam/candidate axes ride sublanes. Everything is
lane-local: the per-lane top-B selection is an unrolled extract-max loop
(max + argmax-via-iota + mask per slot), and the beam-source gather of the
bitmask words is an unrolled select-sum over the B sublane rows -- no
cross-lane communication anywhere, so the kernel is trivially correct under
lane padding and scales linearly in particles. The grid tiles the lane axis
(one program per 128-particle block), so VMEM use is independent of the
particle count.

The extract-max loop unrolls O(B) selection steps of O(B*(C+1)) vector work
each -- quadratic in the beam width, where the XLA top_k is O(B log B). The
kernel wins for the small beams the task needs (B<=64 reproduces the exact
regime, BENCH.md); `recommended()` gates the auto-enable so huge-beam
configs keep the XLA scan instead of compiling a pathological unroll.

Semantically identical to association.beam_scan (parity-tested in
tests/test_association.py via interpret mode); used only where no gradient
is needed (the PHD weight stage -- the loopy smoother's differentiable path
keeps the XLA scan).

Reference for the semantics being accelerated: the k-best / exhaustive
association enumeration of PHDNavigator.cs:462-515 + GraphCombinatorics.cs.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1.0e30
_LANES = 128


def _round_up(x, m):
    return (x + m - 1) // m * m


def recommended(beam_width):
    """Whether the fused kernel should auto-enable for this beam size.

    The in-kernel top-B is an unrolled extract-max loop: O(B) selection
    steps of O(B*(C+1)) vector work, i.e. quadratic in B where lax.top_k is
    O(B log B). B<=64 reproduces the exact-regime task metrics (BENCH.md)
    and is where the kernel measured faster; beyond that the unroll inflates
    both compile time and per-step work, so callers should keep the XLA
    scan."""
    return beam_width <= 64


def _beam_kernel(od_ref, wk_ref, bk_ref, base_ref, out_ref, *, beam_width,
                 n_words, n_steps, n_cand):
    """One program runs the full scan; all refs are lane-last [.., P].

    od_ref: [M, C+1, P] option score deltas; wk_ref/bk_ref: [M, C, P]
    candidate word index / bit; base_ref: [1, P]; out_ref: [B, P]."""
    b = beam_width
    c = n_cand
    c1 = c + 1
    p = out_ref.shape[-1]
    dtype = out_ref.dtype

    row_b = jax.lax.broadcasted_iota(jnp.int32, (b, p), 0)
    scores = jnp.where(row_b == 0, base_ref[:], NEG).astype(dtype)
    words = tuple(jnp.zeros((b, p), jnp.uint32) for _ in range(n_words))

    flat_iota = jax.lax.broadcasted_iota(jnp.int32, (b * c1, p), 0)

    def step(m, carry):
        scores, words = carry[0], carry[1:]
        dk = od_ref[m]  # [C+1, P]
        wk = wk_ref[m]  # [C, P] int32
        bk = bk_ref[m]  # [C, P] uint32

        # membership test: each candidate's word, AND with its bit [B, C, P]
        uw = jnp.zeros((b, c, p), jnp.uint32)
        for w in range(n_words):
            uw = jnp.where(wk[None, :, :] == w, words[w][:, None, :], uw)
        used = (uw & bk[None, :, :]) != 0

        land = scores[:, None, :] + jnp.where(used, NEG, dk[1:][None, :, :])
        clut = scores[:, None, :] + dk[0:1][None, :, :]
        cand = jnp.concatenate([clut, land], axis=1).reshape(b * c1, p)

        # per-lane top-B extract-max loop (sorted descending, like top_k).
        # Extracted entries are masked with -inf (NOT NEG): real candidates
        # can legitimately score below NEG (dead slot + used candidate), and
        # a NEG mask could shadow them -- -inf keeps the ordering identical
        # to lax.top_k in every case.
        new_scores = jnp.full((b, p), NEG, dtype)
        sel_idx = jnp.zeros((b, p), jnp.int32)
        work = cand
        for i in range(b):
            mx = jnp.max(work, axis=0, keepdims=True)  # [1, P]
            idx = jnp.min(
                jnp.where(work == mx, flat_iota, b * c1), axis=0,
                keepdims=True,
            )  # [1, P]
            work = jnp.where(flat_iota == idx, -jnp.inf, work)
            new_scores = jnp.where(row_b == i, mx, new_scores)
            sel_idx = jnp.where(row_b == i, idx, sel_idx)

        src = sel_idx // c1  # [B, P] beam row each slot came from
        choice = sel_idx % c1  # 0 = clutter, 1 + j = candidate j

        # gather the source rows' words: unrolled select-sum over B rows
        g = [jnp.zeros((b, p), jnp.uint32) for _ in range(n_words)]
        for ob in range(b):
            hit = src == ob
            for w in range(n_words):
                g[w] = jnp.where(hit, words[w][ob:ob + 1, :], g[w])

        # picked candidate's (word, bit); 0 when clutter
        pw = jnp.zeros((b, p), jnp.int32)
        pb = jnp.zeros((b, p), jnp.uint32)
        for j in range(c):
            hit = choice == 1 + j
            pw = jnp.where(hit, wk[j:j + 1, :], pw)
            pb = jnp.where(hit, bk[j:j + 1, :], pb)
        new_words = tuple(
            g[w] | jnp.where(pw == w, pb, jnp.uint32(0))
            for w in range(n_words)
        )
        return (new_scores,) + new_words

    carry = jax.lax.fori_loop(0, n_steps, step, (scores,) + words)
    out_ref[:] = carry[0]


@functools.partial(
    jax.jit, static_argnames=("beam_width", "n_words", "interpret")
)
def beam_scan_batch(base, opt_delta, word_k, bit_k, beam_width, n_words,
                    interpret=False):
    """Batched beam scan: inputs are per-particle stacks
    (base [P], opt_delta [P, M, C+1], word_k/bit_k [P, M, C]); returns the
    final beam scores [P, B]. Matches vmap(association.beam_scan)."""
    p, m, c1 = opt_delta.shape
    pp = _round_up(max(p, 1), _LANES)
    dtype = opt_delta.dtype

    def pad_t(x, fill):
        # [P, ...] -> lane-last [..., PP]
        x = jnp.moveaxis(x, 0, -1)
        return jnp.pad(
            x, [(0, 0)] * (x.ndim - 1) + [(0, pp - p)],
            constant_values=fill,
        )

    od = pad_t(opt_delta, NEG)  # [M, C+1, PP]
    wk = pad_t(word_k, 0)  # [M, C, PP]
    bk = pad_t(bit_k, jnp.uint32(0))
    bs = pad_t(base[:, None], 0.0)  # [1, PP]

    kernel = functools.partial(
        _beam_kernel,
        beam_width=beam_width,
        n_words=n_words,
        n_steps=m,
        n_cand=c1 - 1,
    )
    # grid over 128-lane particle tiles: VMEM per program is bounded by the
    # tile (the [M, C+1, 128] inputs + the [B*(C+1), 128] work tensor),
    # independent of the particle count
    c = c1 - 1
    out = pl.pallas_call(
        kernel,
        grid=(pp // _LANES,),
        out_shape=jax.ShapeDtypeStruct((beam_width, pp), dtype),
        in_specs=[
            pl.BlockSpec((m, c1, _LANES), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, c, _LANES), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, c, _LANES), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((beam_width, _LANES), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(od, wk, bk, bs)
    return out[:, :p].T  # [P, B]

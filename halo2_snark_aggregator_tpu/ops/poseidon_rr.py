"""Batched Poseidon permutation over the carry-free redundant representation.

Same schedule as ops/poseidon.py (T=9, 8 full + 63 partial rounds) but on
field_rr limbs, so the transcript hashing of the future fully-traced batched
verifier shares one representation with the MSM kernels (no canonical/
redundant conversions inside the traced program).

State: RR with limbs int32[..., 9, 32]. Rounds run under lax.scan: a scan
over ROUNDS amortizes well (each body is a batched 9x9 field matmul), unlike
the per-limb carry scans that made the canonical representation slow.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..hashes import poseidon_spec as spec
from . import field_rr as fr

FR = fr.FR


@functools.lru_cache(maxsize=1)
def _consts():
    rc, mds = spec.generate_constants()
    rc_m = np.stack([np.stack([FR.to_mont_int(c) for c in row]) for row in rc])
    mds_m = np.stack([np.stack([FR.to_mont_int(c) for c in row]) for row in mds])
    return rc_m, mds_m  # (71, 9, 32), (9, 9, 32)


def _sbox(x: fr.RR) -> fr.RR:
    x2 = fr.mont_mul(FR, x, x)
    x4 = fr.mont_mul(FR, x2, x2)
    return fr.mont_mul(FR, x4, x)


def _mds(state: fr.RR, mds: np.ndarray) -> fr.RR:
    # out[i] = sum_j mds[i][j] * s[j]
    s_exp = fr.RR(state.limbs[..., None, :, :], state.bound)  # (..., 1, 9, 32)
    m = fr.RR(jnp.asarray(mds), 8)
    prod = fr.mont_mul(FR, s_exp, m)  # (..., 9, 9, 32)
    acc = fr.RR(jnp.sum(prod.limbs, axis=-2), prod.bound + 4)  # 9 terms
    if acc.bound > fr.MUL_INPUT_BOUND:
        acc = fr.normalize(FR, acc)
    return acc


def permute(state: fr.RR) -> fr.RR:
    """state: RR limbs int32[..., 9, 32]; returns the permuted state.

    Rounds run under lax.scan (one traced body per phase): the RR limb-bound
    discipline is loop-stable (state normalizes back to the same bound each
    round), so the carry type is fixed and the compiled graph stays small.
    Unlike per-limb carry scans, a scan over ROUNDS amortizes fine on TPU —
    each step is a full batched 9x9 field matmul."""
    rc_m, mds_m = _consts()
    half_f = spec.R_F // 2

    # pin a stable loop bound for the state
    LOOP_BOUND = fr.MUL_INPUT_BOUND

    def stabilize(s: fr.RR) -> fr.RR:
        if s.bound > LOOP_BOUND:
            s = fr.normalize(FR, s)
        return fr.with_bound(s, LOOP_BOUND)

    def full_round(s, rc_row):
        s = fr.add(FR, fr.RR(s, LOOP_BOUND), fr.RR(rc_row, 8))
        s = _sbox(s)
        return stabilize(_mds(s, mds_m)).limbs, None

    def partial_round(s, rc_row):
        st = fr.add(FR, fr.RR(s, LOOP_BOUND), fr.RR(rc_row, 8))
        s0 = _sbox(fr.RR(st.limbs[..., 0:1, :], st.bound))
        limbs = jnp.concatenate([s0.limbs, st.limbs[..., 1:, :]], axis=-2)
        st = _mds(fr.RR(limbs, max(st.bound, s0.bound)), mds_m)
        return stabilize(st).limbs, None

    def partial_chunk(s, rc_rows):
        # UNROLL_P partial rounds per scan step: each round's ops are tiny
        # ((B, 9, 32) int32), so the scan is kernel-launch-bound on TPU —
        # chunking lets XLA fuse across rounds and cuts the launch count
        # ~UNROLL_P x (measured: the sponge chain was 58% of the batched
        # verifier's phase A at batch 32)
        for i in range(rc_rows.shape[0]):
            s, _ = partial_round(s, rc_rows[i])
        return s, None

    UNROLL_P = 7  # 63 = 9 * 7 partial rounds
    limbs = stabilize(state).limbs
    rc = jnp.asarray(rc_m)
    limbs, _ = jax.lax.scan(full_round, limbs, rc[:half_f])
    rc_p = rc[half_f : half_f + spec.R_P]
    if spec.R_P % UNROLL_P == 0:
        rc_chunks = rc_p.reshape(spec.R_P // UNROLL_P, UNROLL_P,
                                 *rc_p.shape[1:])
        limbs, _ = jax.lax.scan(partial_chunk, limbs, rc_chunks)
    else:
        limbs, _ = jax.lax.scan(partial_round, limbs, rc_p)
    limbs, _ = jax.lax.scan(full_round, limbs, rc[half_f + spec.R_P :])
    return fr.RR(limbs, LOOP_BOUND)


def absorb_chunk(state: fr.RR, inputs: fr.RR, n_inputs: int) -> fr.RR:
    """Sponge absorption (cf. ops/poseidon.absorb_chunk): add inputs into
    state[1..1+n], padding 1 at state[1+n] when n < RATE, then permute."""
    assert n_inputs <= spec.RATE
    limbs = state.limbs
    bound = state.bound
    if n_inputs:
        upd = fr.add(
            FR,
            fr.RR(limbs[..., 1 : 1 + n_inputs, :], bound),
            inputs,
        )
        limbs = jnp.concatenate(
            [limbs[..., :1, :], upd.limbs, limbs[..., 1 + n_inputs :, :]], axis=-2
        )
        bound = max(bound, upd.bound)
    if n_inputs < spec.RATE:
        one = fr.RR(jnp.asarray(FR.one_mont), 8)
        slot = fr.add(FR, fr.RR(limbs[..., 1 + n_inputs, :], bound), one)
        limbs = jnp.concatenate(
            [limbs[..., : 1 + n_inputs, :], slot.limbs[..., None, :],
             limbs[..., 2 + n_inputs :, :]],
            axis=-2,
        )
        bound = max(bound, slot.bound)
    return permute(fr.RR(limbs, bound))

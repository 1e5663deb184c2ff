"""Batched Poseidon permutation on TPU (JAX).

Vectorizes the T=9/RATE=8, 8 full + 63 partial round permutation of
hashes/poseidon_spec.py over a leading batch axis: state is a
uint32[batch, 9, 16] Montgomery-Fr limb tensor; the MDS apply is one batched
(9x9) field "matmul" (81 lane-parallel Montgomery muls + log-free adds).

This is the TPU replacement for the reference's per-element transcript
absorb/permute hot spot (SURVEY §2.6: "batched Poseidon permutation kernel
(vmap over proofs)"; hash/poseidon.rs:199-230).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..hashes import poseidon_spec as spec
from . import field as fo

FR = fo.FR


@functools.lru_cache(maxsize=1)
def _mont_constants():
    rc, mds = spec.generate_constants()
    rc_m = np.stack(
        [np.stack([FR.to_mont_int(c) for c in row]) for row in rc]
    )  # (71, 9, 16)
    mds_m = np.stack(
        [np.stack([FR.to_mont_int(c) for c in row]) for row in mds]
    )  # (9, 9, 16)
    return rc_m, mds_m


def _sbox(x):
    x2 = fo.mont_mul(FR, x, x)
    x4 = fo.mont_mul(FR, x2, x2)
    return fo.mont_mul(FR, x4, x)


def _apply_mds(state, mds):
    # state: (..., 9, 16); mds: (9, 9, 16) -> out[i] = sum_j mds[i,j]*s[j]
    prod = fo.mont_mul(FR, state[..., None, :, :], mds)  # (..., 9, 9, 16)
    acc = prod[..., 0, :]
    for j in range(1, spec.T):
        acc = fo.add(FR, acc, prod[..., j, :])
    return acc


@jax.jit
def permute(state):
    """Poseidon permutation over uint32[..., 9, 16] Montgomery-Fr states.

    Rounds run under lax.scan (3 scans: full/partial/full) so the compiled
    graph holds one round body per phase, not 71 unrolled rounds."""
    rc_m, mds_m = _mont_constants()
    rc = jnp.asarray(rc_m)
    mds = jnp.asarray(mds_m)
    half_f = spec.R_F // 2

    def full_round(s, c):
        s = fo.add(FR, s, c)
        s = _sbox(s)
        return _apply_mds(s, mds), None

    def partial_round(s, c):
        s = fo.add(FR, s, c)
        s0 = _sbox(s[..., 0:1, :])
        s = jnp.concatenate([s0, s[..., 1:, :]], axis=-2)
        return _apply_mds(s, mds), None

    state, _ = jax.lax.scan(full_round, state, rc[:half_f])
    state, _ = jax.lax.scan(partial_round, state, rc[half_f : half_f + spec.R_P])
    state, _ = jax.lax.scan(full_round, state, rc[half_f + spec.R_P :])
    return state


def absorb_chunk(state, inputs, n_inputs: int):
    """One sponge absorption: add `inputs` (uint32[..., n_inputs, 16]) into
    state[1..1+n], add the padding 1 at state[1+n] when n < RATE, permute.

    Mirrors hash/poseidon.rs absorb_with_pre_constants semantics (the constant
    add is folded into permute's first round)."""
    assert n_inputs <= spec.RATE
    if n_inputs:
        upd = fo.add(FR, state[..., 1 : 1 + n_inputs, :], inputs)
        state = jnp.concatenate(
            [state[..., :1, :], upd, state[..., 1 + n_inputs :, :]], axis=-2
        )
    if n_inputs < spec.RATE:
        one = jnp.broadcast_to(
            jnp.asarray(FR.one_mont), state[..., 1 + n_inputs, :].shape
        )
        slot = fo.add(FR, state[..., 1 + n_inputs, :], one)
        state = jnp.concatenate(
            [
                state[..., : 1 + n_inputs, :],
                slot[..., None, :],
                state[..., 2 + n_inputs :, :],
            ],
            axis=-2,
        )
    return permute(state)

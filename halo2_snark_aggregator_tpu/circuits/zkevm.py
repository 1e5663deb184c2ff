"""zkEVM-shaped target circuit (reference A27 zkevm_test / C9 zkevm bench).

The reference pulls scroll's zkevm-circuits EvmCircuit as a dev-dependency and
verifies/aggregates its K=16..18 proofs (api tests/systems/halo2/zkevm_test/
verify_single.rs:30, circuit benches/zkevm_bench.rs:34-35). That Rust workspace
is out of scope here; this family reproduces the *verifier-visible shape* of
that workload — the part that exercises the protocol engine and the TPU
kernels — at a configurable K:

- many phase-0 advice columns (``3*n_groups + 2``; the EvmCircuit is ~140 wide)
  with one custom gate per group, alternating mul/add forms, so the gate
  expression evaluator (verify.rs params.rs:75-225 analog) walks many
  polynomials;
- a *gate-enforced* chain with a next-row rotation on group 0 (queries at wx
  in the advice rotation set, beyond what lookups already add);
- two lookup arguments: an 8-bit byte range lookup and a theta-compressed
  two-column (t, t^2) pair lookup (zkevm's fixed range/bitwise tables);
- a phase-1 RLC accumulator column over a challenge squeezed after phase 0
  (zkevm's keccak-RLC pattern; reference multi-phase replay verify.rs:350-391);
- a wide copy web: each group's output feeds the next group's input on the
  same row, so the permutation argument spans ``2*n_groups`` columns and
  multiple chunks;
- one instance column exposing the final chain value.

Defaults give 27 advice columns (3*n_groups + 2 phase-0 plus one phase-1 z
column), 13 gates, 2 lookups, a 9-column permutation
— proving at K=16+ reproduces BASELINE.md config 3 (2^16-point MSMs in the
verifier's instance commitment and multiopen).
"""

from __future__ import annotations

import dataclasses

from ..ff.bn254 import R
from ..protocol.plonk import Circuit, ConstraintSystem, Expression


@dataclasses.dataclass
class ZkevmShapeConfig:
    groups: list  # (a, b, c, q) per group
    q_chain: object
    w: object
    wsq: object
    t_byte: object
    t_sq_in: object
    t_sq_out: object
    z: object
    r: int  # challenge index
    q_rlc: object
    q_rlc_first: object
    instance: object


class ZkevmShapeCircuit(Circuit):
    """k: circuit size; n_groups: width knob (3 advice cols + 1 gate each)."""

    def __init__(self, k: int = 9, seed: int = 1, n_groups: int = 8,
                 table_bits: int = 8):
        self.K = k
        self.seed = seed
        self.n_groups = n_groups
        self.table_bits = table_bits
        # leave headroom for blinding rows of a lookup-bearing circuit
        budget = (1 << k) - ((1 << k) >> 2) - 32
        if budget < 8 or (1 << table_bits) > budget:
            raise ValueError(
                f"infeasible (k={k}, table_bits={table_bits}): the "
                f"{1 << table_bits}-row lookup tables exceed the {budget}-row "
                f"usable budget; need k >= {max(table_bits + 1, 7)}")
        self.rows = budget
        s = (seed * 0x9E3779B9 + 0x243F6A88) & 0xFFFFFFFF

        def xorshift():
            nonlocal s
            s ^= (s << 13) & 0xFFFFFFFF
            s ^= s >> 17
            s ^= (s << 5) & 0xFFFFFFFF
            return s

        self.b_vals = [[xorshift() % ((1 << 16) - 1) + 1 for _ in range(self.rows)]
                       for _ in range(n_groups)]
        self.w_vals = [xorshift() & ((1 << table_bits) - 1)
                       for _ in range(self.rows)]

    def configure(self, cs: ConstraintSystem) -> ZkevmShapeConfig:
        groups = []
        for g in range(self.n_groups):
            a = cs.advice_column()
            b = cs.advice_column()
            c = cs.advice_column()
            q = cs.fixed_column()
            if g > 0:
                cs.enable_equality(a)
            cs.enable_equality(c)
            a_e, b_e, c_e = (cs.query_advice(col, 0) for col in (a, b, c))
            q_e = cs.query_fixed(q, 0)
            if g % 2 == 0:
                cs.create_gate(f"g{g}_mul", [q_e * (a_e * b_e - c_e)])
            else:
                cs.create_gate(f"g{g}_add", [q_e * (a_e + b_e - c_e)])
            groups.append((a, b, c, q))

        # gate-enforced chain on group 0 with a next-row rotation (wx query)
        q_chain = cs.fixed_column()
        a0_next = cs.query_advice(groups[0][0], 1)
        c_last = cs.query_advice(groups[-1][2], 0)
        cs.create_gate("chain", [cs.query_fixed(q_chain, 0) * (a0_next - c_last)])

        # lookups: byte range + theta-compressed (t, t^2) pair
        w = cs.advice_column()
        wsq = cs.advice_column()
        t_byte = cs.fixed_column()
        t_sq_in = cs.fixed_column()
        t_sq_out = cs.fixed_column()
        cs.lookup("byte_range", [(cs.query_advice(w, 0),
                                  cs.query_fixed(t_byte, 0))])
        cs.lookup("square_pair", [
            (cs.query_advice(w, 0), cs.query_fixed(t_sq_in, 0)),
            (cs.query_advice(wsq, 0), cs.query_fixed(t_sq_out, 0)),
        ])

        # phase-1 RLC accumulator over a post-phase-0 challenge
        z = cs.advice_column(1)
        r = cs.challenge_usable_after(0)
        q_rlc = cs.fixed_column()
        q_rlc_first = cs.fixed_column()
        z_e = cs.query_advice(z, 0)
        z_next = cs.query_advice(z, 1)
        w_e = cs.query_advice(w, 0)
        r_e = Expression.challenge(r)
        cs.create_gate("rlc", [
            cs.query_fixed(q_rlc_first, 0) * z_e,
            cs.query_fixed(q_rlc, 0) * (z_next - z_e * r_e - w_e),
        ])

        instance = cs.instance_column()
        cs.enable_equality(instance)
        return ZkevmShapeConfig(groups, q_chain, w, wsq, t_byte, t_sq_in,
                                t_sq_out, z, r, q_rlc, q_rlc_first, instance)

    def _trace(self):
        """Per row: group 0 input chains from the previous row's last-group
        output (gate-enforced); within a row, group g input = group g-1
        output (copy-enforced)."""
        rows = []
        acc = (self.seed + 2) % R
        for i in range(self.rows):
            row = []
            a = acc
            for g in range(self.n_groups):
                b = self.b_vals[g][i]
                c = a * b % R if g % 2 == 0 else (a + b) % R
                row.append((a, b, c))
                a = c
            rows.append(row)
            acc = a
        return rows, acc

    def synthesize(self, config: ZkevmShapeConfig, assigner):
        for t in range(1 << self.table_bits):
            assigner.assign_fixed(config.t_byte, t, t)
            assigner.assign_fixed(config.t_sq_in, t, t)
            assigner.assign_fixed(config.t_sq_out, t, t * t % R)

        rows, _final = self._trace()
        for i, row in enumerate(rows):
            for g, (av, bv, cv) in enumerate(row):
                a_col, b_col, c_col, q_col = config.groups[g]
                assigner.assign_advice(a_col, i, av)
                assigner.assign_advice(b_col, i, bv)
                assigner.assign_advice(c_col, i, cv)
                assigner.assign_fixed(q_col, i, 1)
                if g > 0:
                    assigner.copy(config.groups[g - 1][2], i, a_col, i)
            if i + 1 < len(rows):
                assigner.assign_fixed(config.q_chain, i, 1)
            wv = self.w_vals[i]
            assigner.assign_advice(config.w, i, wv)
            assigner.assign_advice(config.wsq, i, wv * wv % R)

        assigner.copy(config.groups[-1][2], len(rows) - 1, config.instance, 0)

        # RLC fixed selectors are assigned UNCONDITIONALLY: keygen synthesizes
        # with no challenges, and the committed fixed columns must enable the
        # gate regardless (a challenge-gated assignment would commit all-zero
        # selectors, leaving z unconstrained — see shuffle.py's pattern)
        assigner.assign_fixed(config.q_rlc_first, 0, 1)
        for i in range(len(rows) - 1):
            assigner.assign_fixed(config.q_rlc, i, 1)

        # phase-1 witness: needs the challenge squeezed after phase 0.
        # During keygen / the prover's phase-0 pass get_challenge is None —
        # fall back to MockProver's challenge constant 1 so its gate check
        # passes (phase-0 advice for a phase-1 column is discarded by the
        # prover, so the fallback values never reach a real proof).
        r = assigner.get_challenge(config.r)
        if r is None:
            r = 1
        z = 0
        assigner.assign_advice(config.z, 0, z)
        for i in range(len(rows) - 1):
            z = (z * r + self.w_vals[i]) % R
            assigner.assign_advice(config.z, i + 1, z)

    def instances(self) -> list[list[int]]:
        _rows, final = self._trace()
        return [[final]]

"""Recording context + levelized batched executor (the TPU "tape").

The protocol engine runs ONCE per (vk, batch-size) through `TapeFieldChip`,
recording every scalar op into a tape of SSA slots. The tape is then
levelized (ops grouped by dependency depth and kind, padded to uniform width)
and executed on device as ONE `lax.scan` over levels whose body performs a
gather -> batched field op -> scatter against a slots buffer of shape
(n_slots, B, 32). Poseidon permutations are recorded as dedicated tape
entries and dispatched to the fused kernel (ops/poseidon_rr) between scalar
segments.

Why: tracing the protocol's ~20k scalar ops through the redundant-Montgomery
kernels inline would produce a multi-million-node XLA graph; the tape caps
the graph at (segment count x one scan body) while executing the identical
arithmetic. This realizes SURVEY §7's "one jitted program [per vk], proof
data as batched operands" and doubles as the analog of the reference's
codegen-context trick (record once, execute elsewhere — ctx.rs).

Status: machinery + differential tests (round 1); full verifier wiring is
the round-2 integration.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..ff import bn254 as ff
from ..hashes import poseidon_spec as pspec
from ..ops import field_rr as fr
from ..ops import poseidon_rr
from .api import FieldChip

FR = fr.FR

# tape ops (INV runs as its own segment: its 256-step pow scan must not be
# paid on every level)
OP_MUL, OP_ADD, OP_SUB = 0, 1, 2
_OPS = (OP_MUL, OP_ADD, OP_SUB)


@dataclasses.dataclass(frozen=True)
class Slot:
    idx: int
    level: int


class Tape:
    def __init__(self):
        self.n_slots = 0
        self.records: list[tuple[int, int, int, int]] = []  # (op, a, b, out)
        self.const_slots: dict[int, int] = {}
        self.consts: list[tuple[int, int]] = []  # (slot, value)
        self.input_slots: list[int] = []
        self.poseidon_calls: list[tuple[tuple[int, ...], tuple[int, ...], tuple[int, ...]]] = []
        self.inv_calls: list[tuple[int, int]] = []
        # segments: list of ("ops", [record indices]) | ("poseidon", call index)
        self._segments: list = [("ops", [])]

    def new_slot(self, level: int) -> Slot:
        s = Slot(self.n_slots, level)
        self.n_slots += 1
        return s

    def record(self, op: int, a: Slot, b: Slot) -> Slot:
        out = self.new_slot(max(a.level, b.level) + 1)
        self.records.append((op, a.idx, b.idx, out.idx))
        self._segments[-1][1].append(len(self.records) - 1)
        return out

    def record_inv(self, a: Slot) -> Slot:
        out = self.new_slot(0)
        self.inv_calls.append((a.idx, out.idx))
        self._segments.append(("inv", len(self.inv_calls) - 1))
        self._segments.append(("ops", []))
        return out

    def record_poseidon(self, state: list[Slot], inputs: list[Slot]) -> list[Slot]:
        out = [self.new_slot(0) for _ in range(pspec.T)]
        self.poseidon_calls.append(
            (tuple(s.idx for s in state), tuple(s.idx for s in inputs),
             tuple(s.idx for s in out))
        )
        self._segments.append(("poseidon", len(self.poseidon_calls) - 1))
        self._segments.append(("ops", []))
        return out

    def segments(self):
        return [s for s in self._segments if s[0] != "ops" or s[1]]


class TapeFieldChip(FieldChip):
    """FieldChip that records into a Tape. AssignedValue = Slot."""

    def __init__(self, tape: Tape):
        self.tape = tape

    def assign_const(self, ctx, v: int) -> Slot:
        v %= FR.modulus
        if v in self.tape.const_slots:
            idx = self.tape.const_slots[v]
            return Slot(idx, 0)
        s = self.tape.new_slot(0)
        self.tape.const_slots[v] = s.idx
        self.tape.consts.append((s.idx, v))
        return s

    def assign_input(self, ctx) -> Slot:
        """Declare a runtime input (proof scalar / instance value)."""
        s = self.tape.new_slot(0)
        self.tape.input_slots.append(s.idx)
        return s

    def assign_var(self, ctx, v) -> Slot:
        if isinstance(v, Slot):
            return v
        return self.assign_const(ctx, v)

    def to_value(self, a: Slot):
        raise TypeError("tape values are symbolic; execute the tape instead")

    def add(self, ctx, a, b):
        return self.tape.record(OP_ADD, a, b)

    def sub(self, ctx, a, b):
        return self.tape.record(OP_SUB, a, b)

    def neg(self, ctx, a):
        return self.sub(ctx, self.assign_const(ctx, 0), a)

    def mul(self, ctx, a, b):
        return self.tape.record(OP_MUL, a, b)

    def div(self, ctx, a, b):
        inv_b = self.tape.record_inv(b)
        return self.tape.record(OP_MUL, a, inv_b)

    def sum_with_coeff_and_constant(self, ctx, pairs, constant):
        acc = self.assign_const(ctx, constant)
        for v, c in pairs:
            if c == 1:
                acc = self.add(ctx, acc, v)
            else:
                acc = self.add(ctx, acc, self.mul(ctx, v, self.assign_const(ctx, c)))
        return acc

    def poseidon_permute(self, ctx, state: list, inputs: list) -> list:
        return self.tape.record_poseidon(state, inputs)


# ---------------------------------------------------------------------------
# Compilation: levelize op segments, build the executor
# ---------------------------------------------------------------------------
#
# Two schedulers share the executor helpers:
#
#   * legacy (H2T_TAPE_LEGACY=1): execute segments in record order — one
#     lax.scan per ops segment, one inline-traced permutation per poseidon
#     call, one 254-step pow scan per inv call.  ~55 traced bodies for the
#     verifier tape; the inv chains alone are ~2/3 of the serial mul depth
#     (each inv is ~508 serial mont_muls, and the verifier records ~21).
#
#   * reordered (default): the sponge chain only ever absorbs tape INPUTS
#     and constants (transcript reads + instance-commit coords — never a
#     computed scalar), so every poseidon call is hoisted into ONE lax.scan
#     over calls (verified by a closure check; falls back to legacy if a
#     tape violates it).  The remaining scalar ops and inversions are
#     levelized GLOBALLY by slot dependency; inversions at one level batch
#     into a single stacked fr.inv (one 254-step pow scan for the whole
#     group instead of one per call).  Serial depth drops ~3x and the
#     traced-body count drops ~10x (compile time scales with it).
# ---------------------------------------------------------------------------


def _levelize(records: list[tuple[int, int, int, int]]):
    """Group records by dependency level (within this segment) and op kind,
    padding each (level, op) group to the segment-wide max width."""
    level_of: dict[int, int] = {}

    def lv(slot: int) -> int:
        return level_of.get(slot, 0)

    grouped: dict[int, dict[int, list]] = {}
    for op, a, b, out in records:
        level = max(lv(a), lv(b)) + 1
        level_of[out] = level
        grouped.setdefault(level, {}).setdefault(op, []).append((a, b, out))

    levels = []
    for level in sorted(grouped):
        levels.append(grouped[level])
    return _tables_from_level_groups(levels)


def _tables_from_level_groups(levels: list[dict[int, list]]):
    """Per-level {op: [(a, b, out)]} groups -> padded scan tables
    ((tables, valid, n_levels, width), the _levelize contract)."""
    width = max(
        (len(v) for g in levels for v in g.values()), default=1
    )
    # tables: per level, per op kind: (a_idx, b_idx, out_idx, valid) padded
    n_levels = len(levels)
    tables = {
        op: np.zeros((n_levels, width, 3), dtype=np.int32) for op in _OPS
    }
    valid = {op: np.zeros((n_levels, width), dtype=bool) for op in _OPS}
    for li, g in enumerate(levels):
        for op, entries in g.items():
            for k, (a, b, out) in enumerate(entries):
                tables[op][li, k] = (a, b, out)
                valid[op][li, k] = True
    return tables, valid, n_levels, width


def _reordered_plan(tape: Tape):
    """Build the reordered schedule: (poseidon scan arrays, plan) or None
    when the tape's sponge chain reads a computed slot (closure violation —
    legal for an exotic chip user, just not schedulable this way)."""
    ok = set(tape.input_slots) | {s for s, _ in tape.consts}
    for st, inp, out in tape.poseidon_calls:
        if any(s not in ok for s in list(st) + list(inp)):
            return None
        ok |= set(out)

    P = len(tape.poseidon_calls)
    rate, t_width = pspec.RATE, pspec.T
    st_idx = np.zeros((P, t_width), np.int32)
    in_idx = np.zeros((P, rate), np.int32)
    in_mask = np.zeros((P, rate), bool)
    pad_oh = np.zeros((P, t_width), np.int32)
    out_idx = np.zeros((P, t_width), np.int32)
    for j, (st, inp, out) in enumerate(tape.poseidon_calls):
        st_idx[j] = st
        n = len(inp)
        in_idx[j, :n] = inp
        in_mask[j, :n] = True
        if n < rate:
            pad_oh[j, 1 + n] = 1  # sponge pad marker (absorb_chunk)
        out_idx[j] = out
    pose = (st_idx, in_idx, in_mask, pad_oh, out_idx) if P else None

    # Global dependency levelization of scalar ops + inversions.  Record
    # order is a valid topological order (SSA slots), so one forward pass
    # assigns levels; inputs/consts/poseidon outputs sit at level 0.
    level_of: dict[int, int] = {}

    def lv(slot: int) -> int:
        return level_of.get(slot, 0)

    ops_by_level: dict[int, dict[int, list]] = {}
    invs_by_level: dict[int, list] = {}
    for seg in tape.segments():
        if seg[0] == "ops":
            for ri in seg[1]:
                op, a, b, out = tape.records[ri]
                level = max(lv(a), lv(b)) + 1
                level_of[out] = level
                ops_by_level.setdefault(level, {}).setdefault(
                    op, []).append((a, b, out))
        elif seg[0] == "inv":
            a, out = tape.inv_calls[seg[1]]
            level = lv(a) + 1
            level_of[out] = level
            invs_by_level.setdefault(level, []).append((a, out))

    # Emit: runs of inv-free levels fold into one scan; each inv-bearing
    # level batches its inversions into a single stacked fr.inv (one pow
    # scan per GROUP).  Ops at an inv level are independent of that level's
    # inv outputs (same level = same prerequisites), so they join the run
    # flushed just before the inv batch.
    plan: list = []
    run_groups: list = []
    for level in range(1, max([*ops_by_level, *invs_by_level], default=0) + 1):
        if level in ops_by_level:
            run_groups.append(ops_by_level[level])
        if level in invs_by_level:
            if run_groups:
                plan.append(("ops", _tables_from_level_groups(run_groups)))
                run_groups = []
            pairs = invs_by_level[level]
            plan.append(("invb", (
                np.asarray([a for a, _ in pairs], np.int32),
                np.asarray([o for _, o in pairs], np.int32))))
    if run_groups:
        plan.append(("ops", _tables_from_level_groups(run_groups)))
    return pose, plan


def compile_tape(tape: Tape, batch: int):
    """Returns run(inputs: int32[n_inputs, B, 32] Montgomery-RR) ->
    slots buffer int32[n_slots, B, 32] (jit-able)."""
    const_arr = np.zeros((max(len(tape.consts), 1), fr.NLIMBS), dtype=np.int32)
    const_idx = np.zeros(max(len(tape.consts), 1), dtype=np.int32)
    for i, (slot, v) in enumerate(tape.consts):
        const_arr[i] = FR.to_mont_int(v)
        const_idx[i] = slot
    input_idx = np.asarray(tape.input_slots, dtype=np.int32)

    import os

    reordered = None
    if not os.environ.get("H2T_TAPE_LEGACY"):
        reordered = _reordered_plan(tape)
    seg_plans = []
    if reordered is None:
        for seg in tape.segments():
            if seg[0] == "ops":
                recs = [tape.records[i] for i in seg[1]]
                seg_plans.append(("ops", _levelize(recs)))
            elif seg[0] == "inv":
                seg_plans.append(("inv", tape.inv_calls[seg[1]]))
            else:
                seg_plans.append(("poseidon", tape.poseidon_calls[seg[1]]))

    BOUND = fr.MUL_INPUT_BOUND

    def _seg_ops(slots, plan):
        tables, valid, n_levels, width = plan

        def body(slots, xs):
            tab_mul, v_mul, tab_add, v_add, tab_sub, v_sub = xs

            def apply(slots, tab, vmask, fn):
                a = fr.RR(slots[tab[:, 0]], BOUND)
                b = fr.RR(slots[tab[:, 1]], BOUND)
                out = fn(a, b)
                out = fr.normalize(FR, out) if out.bound > BOUND else out
                out_l = jnp.where(vmask[:, None, None], out.limbs, slots[tab[:, 2]])
                return slots.at[tab[:, 2]].set(out_l)

            slots = apply(slots, tab_mul, v_mul, lambda a, b: fr.mont_mul(FR, a, b))
            slots = apply(slots, tab_add, v_add, lambda a, b: fr.add(FR, a, b))
            slots = apply(slots, tab_sub, v_sub, lambda a, b: fr.sub(FR, a, b))
            return slots, None

        xs = (
            jnp.asarray(tables[OP_MUL]), jnp.asarray(valid[OP_MUL]),
            jnp.asarray(tables[OP_ADD]), jnp.asarray(valid[OP_ADD]),
            jnp.asarray(tables[OP_SUB]), jnp.asarray(valid[OP_SUB]),
        )
        slots, _ = jax.lax.scan(body, slots, xs)
        return slots

    # Timing-only ablation (H2T_TAPE_SKIP=poseidon|ops|inv): skip that
    # segment kind entirely so an A/B pair of phase-A runs attributes the
    # wall time between the sponge chain and the levelized scalar scans.
    # Results are WRONG with the flag set — never enable outside profiling.
    skip_kind = os.environ.get("H2T_TAPE_SKIP", "")

    def _pose_scan(slots, pose):
        """All sponge permutations as ONE scan over calls: per step, gather
        the 9 state + up-to-8 input slots, add inputs (and the sponge pad
        marker) into state[1..], permute, scatter the 9 outputs.  Value-
        identical to per-call absorb_chunk (adds are plain limb adds; the
        permutation normalizes its input either way)."""
        one = jnp.asarray(FR.one_mont)

        def body(slots, xs):
            st_i, in_i, in_m, pad_o, out_i = xs
            state_l = slots[st_i]                           # (9, B, 32)
            ins = slots[in_i]                               # (8, B, 32)
            ins = jnp.where(in_m[:, None, None], ins, 0)
            add_vec = jnp.concatenate(
                [jnp.zeros_like(ins[:1]), ins], axis=0
            ) + pad_o[:, None, None] * one[None, None, :]
            st = fr.RR(jnp.moveaxis(state_l + add_vec, 0, -2), BOUND + 2)
            out = poseidon_rr.permute(st)                   # (B, 9, 32)
            out_l = jnp.moveaxis(out.limbs, -2, 0)
            return slots.at[out_i].set(out_l), None

        xs = tuple(jnp.asarray(a) for a in pose)
        slots, _ = jax.lax.scan(body, slots, xs)
        return slots

    def run(inputs):
        n = max(tape.n_slots, 1)
        slots = jnp.zeros((n, batch, fr.NLIMBS), dtype=jnp.int32)
        slots = slots.at[jnp.asarray(const_idx)].set(
            jnp.broadcast_to(
                jnp.asarray(const_arr)[:, None, :],
                (const_arr.shape[0], batch, fr.NLIMBS),
            )
        )
        if len(input_idx):
            slots = slots.at[jnp.asarray(input_idx)].set(inputs)
        if reordered is not None:
            pose, plan = reordered
            if pose is not None and skip_kind != "poseidon":
                slots = _pose_scan(slots, pose)
            for kind, payload in plan:
                if kind == "ops" and skip_kind != "ops":
                    slots = _seg_ops(slots, payload)
                elif kind == "invb" and skip_kind != "inv":
                    a_idx, out_idx = payload
                    out = fr.inv(FR, fr.RR(slots[jnp.asarray(a_idx)], BOUND))
                    slots = slots.at[jnp.asarray(out_idx)].set(out.limbs)
            return slots
        for kind, plan in seg_plans:
            if kind == skip_kind:
                continue
            if kind == "ops":
                slots = _seg_ops(slots, plan)
            elif kind == "inv":
                a_idx, out_idx = plan
                out = fr.inv(FR, fr.RR(slots[a_idx], BOUND))
                slots = slots.at[out_idx].set(out.limbs)
            else:
                state_idx, in_idx, out_idx = plan
                state = fr.RR(slots[jnp.asarray(state_idx)], BOUND)  # (9, B, 32)
                state = fr.RR(jnp.moveaxis(state.limbs, 0, -2), BOUND)  # (B, 9, 32)
                if in_idx:
                    inp = fr.RR(
                        jnp.moveaxis(slots[jnp.asarray(in_idx)], 0, -2), BOUND
                    )
                else:
                    inp = fr.RR(state.limbs[..., :0, :], 1)
                out = poseidon_rr.absorb_chunk(state, inp, len(in_idx))
                out_l = jnp.moveaxis(out.limbs, -2, 0)  # (9, B, 32)
                slots = slots.at[jnp.asarray(out_idx)].set(out_l)
        return slots

    return run

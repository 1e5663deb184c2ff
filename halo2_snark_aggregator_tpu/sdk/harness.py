"""Target-circuit harness (reference sample_circuit.rs + zkaggregate! stages).

`TargetCircuitSpec` mirrors the TargetCircuit trait (sample_circuit.rs:20-40:
K, PUBLIC_INPUT_SIZE, N_PROOFS, NAME + builders). Stage functions mirror the
zkcli dispatchers (sdk/src/lib.rs:83-177): each stage round-trips artifacts
through the FolderStore so any stage can be re-run independently.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Callable

from ..arith.tpu_value import make_tpu_chips
from ..arith.value import ValueContext, ValueEccChip
from ..protocol import verify as pv
from ..protocol.transcript import PoseidonTranscriptRead
from ..prover.keygen import keygen
from ..prover.kzg import ParamsKZG
from ..prover.prove import create_proof
from ..transcript.host import PoseidonWrite
from ..utils.store import FolderStore

log = logging.getLogger(__name__)


@dataclasses.dataclass
class TargetCircuitSpec:
    name: str
    k: int
    n_proofs: int
    public_input_size: int
    circuit_builder: Callable[[int], object]  # seed -> Circuit with witness
    instance_builder: Callable[[object], list]  # circuit -> [col][row] values


def sample_setup(spec: TargetCircuitSpec, store: FolderStore):
    """Generate params + vk for the target circuit (sample_circuit.rs:42-67)."""
    params = ParamsKZG.setup_cached(spec.k)
    circuit = spec.circuit_builder(0)
    vk, pk = keygen(circuit, spec.k, params)
    store.write_target_params(spec.name, params)
    store.write_target_vkey(spec.name, (vk, pk))
    log.info("sample_setup(%s): k=%d done", spec.name, spec.k)


def sample_run(spec: TargetCircuitSpec, store: FolderStore):
    """Create N_PROOFS proofs + self-verify each (sample_circuit.rs:69-124)."""
    params = store.read_target_params(spec.name)
    vk, pk = store.read_target_vkey(spec.name)
    for i in range(spec.n_proofs):
        circuit = spec.circuit_builder(i + 1)
        instances = spec.instance_builder(circuit)
        proof = create_proof(pk, params, [circuit], [instances], PoseidonWrite(), seed=i)
        # immediate self-verification on the value context
        ctx = ValueContext()
        pchip = ValueEccChip()
        nchip = schip = pchip.scalar_chip
        t = PoseidonTranscriptRead(proof, ctx, nchip)
        cp = pv.CircuitProof(
            name=spec.name, vk=vk, params=params,
            proofs=[pv.ProofData(instances=[instances], transcript=t, key=f"{spec.name}_{i}")],
        )
        *_, ok = pv.verify_single_proof_in_chip(ctx, nchip, schip, pchip, cp)
        if not ok:
            raise RuntimeError(f"self-verification failed for proof {i}")
        store.write_target_proof(spec.name, i, proof)
        store.write_target_instance(spec.name, i, instances)
        log.info("sample_run(%s): proof %d ok (%d bytes)", spec.name, i, len(proof))


def verify_check(specs: list[TargetCircuitSpec], store: FolderStore,
                 use_tpu: bool = True, mesh=None):
    """Aggregate-verify all stored proofs on the TPU path; persist the final
    pair (the reference's calc_verify_circuit_final_pair analog,
    verify_circuit.rs:103-201)."""
    if use_tpu:
        ctx, nchip, schip, pchip = make_tpu_chips(mesh=mesh)
    else:
        ctx = ValueContext()
        pchip = ValueEccChip()
        nchip = schip = pchip.scalar_chip

    circuits = []
    for spec in specs:
        params = store.read_target_params(spec.name)
        vk, _pk = store.read_target_vkey(spec.name)
        proofs = []
        for i in range(spec.n_proofs):
            proof = store.read_target_proof(spec.name, i)
            instances = store.read_target_instance(spec.name, i)
            t = PoseidonTranscriptRead(proof, ctx, nchip)
            proofs.append(
                pv.ProofData(instances=[instances], transcript=t, key=f"{spec.name}_{i}")
            )
        circuits.append(pv.CircuitProof(name=spec.name, vk=vk, params=params, proofs=proofs))

    agg_transcript = PoseidonTranscriptRead(b"", ctx, nchip)
    w_x, w_g, plain_instances, commits, ok = pv.verify_aggregation_proofs_in_chip(
        ctx, nchip, schip, pchip, circuits, agg_transcript
    )
    if not ok:
        raise RuntimeError("aggregated pairing check failed")
    store.write_final_pair(w_x, w_g)
    log.info("verify_check: %d circuits aggregated, final pair stored; ctx=%s",
             len(circuits), ctx)
    return w_x, w_g, plain_instances

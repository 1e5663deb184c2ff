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


# ---------------------------------------------------------------------------
# Outer-proof stages (reference C5: MultiCircuitsSetup / MultiCircuitsCreate-
# Proof / VerifyCheck, verify_circuit.rs:644-765, 898-1010, 1012-1055)
# ---------------------------------------------------------------------------

def _load_targets(specs: list[TargetCircuitSpec], store: FolderStore):
    from ..circuits.aggregator import SingleProofWitness, VerifierCircuitTarget

    targets = []
    for spec in specs:
        params = store.read_target_params(spec.name)
        vk, _pk = store.read_target_vkey(spec.name)
        proofs = []
        for i in range(spec.n_proofs):
            proofs.append(SingleProofWitness(
                instances=store.read_target_instance(spec.name, i),
                transcript=store.read_target_proof(spec.name, i)))
        targets.append(VerifierCircuitTarget(
            name=spec.name, vk=vk, params=params, proofs=proofs))
    return targets


def verify_setup(specs: list[TargetCircuitSpec], store: FolderStore,
                 agg_k: int = 22):
    """Aggregation-circuit keygen (MultiCircuitsSetup::call). Stores the
    aggregator vkey; like the reference, the proving key is regenerated
    during verify_run (verify_circuit.rs:974-979) rather than persisted."""
    from ..circuits.aggregator import AggregatorCircuit
    from ..prover.accel import keygen_accel
    from ..prover.srs import setup_cached_accel

    aparams = setup_cached_accel(agg_k)
    agg = AggregatorCircuit(_load_targets(specs, store))
    vk, _apk = keygen_accel(agg, agg_k, aparams, spill=agg_k >= 18)
    store.write_verify_vkey(vk)
    log.info("verify_setup: aggregator vkey at k=%d stored", agg_k)
    return vk


def verify_run(specs: list[TargetCircuitSpec], store: FolderStore,
               agg_k: int = 22, seed: int = 0, transcript: str = "sha"):
    """Create the outer aggregation proof (MultiCircuitsCreateProof::call):
    mock-run final pair -> 136-bit instance packing -> aggregator keygen ->
    TPU-accelerated proof with the SHA256 transcript (so an EVM verifier can
    recompute the challenges — verify_circuit.rs:984-995). Pass
    transcript="poseidon" when this proof feeds a SECOND recursion layer
    (the in-circuit transcript reader is Poseidon)."""
    from ..circuits.aggregator import AggregatorCircuit

    agg = AggregatorCircuit(_load_targets(specs, store))
    return _prove_aggregator(agg, store, agg_k, seed, transcript)


def _prove_aggregator(agg, store: FolderStore, agg_k: int, seed: int,
                      transcript: str):
    from ..prover.accel import create_proof_accel, keygen_accel
    from ..prover.srs import setup_cached_accel
    from ..transcript.host import ShaWrite

    aparams = setup_cached_accel(agg_k)

    w_x, w_g, plain = agg.calc_final_pair()
    from ..protocol.instances import final_pair_to_instances
    instances = [final_pair_to_instances(w_x, w_g, plain)]
    store.write_final_pair(w_x, w_g)
    store.write_verify_instance(instances)

    spill = agg_k >= 18  # the k=22 working set exceeds one chip's HBM
    # checkpoint the (expensive) aggregator keygen so a crashed prove phase
    # resumes without repaying it (the reference's stage-wise fs.rs story)
    import json as _json

    import numpy as _np
    apk_path = store._path(f"verify_circuit_apk_k{agg_k}.npz")
    # The checkpoint's fixed/sigma columns are only valid for the EXACT
    # aggregator shape they were keygen'd for: reusing a 2-proof checkpoint
    # for a 1-proof run misaligns the fixed lookup selectors against the
    # fresh advice synthesis and fails deep in the prover with an opaque
    # "lookup input value not present in table" (round-5 bench_outer
    # OUTER_NPROOFS footgun). Fingerprint the shape in a sidecar.
    fp = {"n_targets": len(agg.circuits),
          "n_proofs": [len(t.proofs) for t in agg.circuits]} \
        if hasattr(agg, "circuits") else {}
    fp_path = store._path(f"verify_circuit_apk_k{agg_k}.shape.json")
    ckpt_ok = spill and apk_path.exists()
    if ckpt_ok and fp and fp_path.exists():
        saved = _json.loads(fp_path.read_text())
        if saved != fp:
            log.warning(
                "verify_run: keygen checkpoint shape mismatch (%s vs %s); "
                "re-running keygen", saved, fp)
            ckpt_ok = False
    if ckpt_ok:
        from ..prover.accel import AccelPk
        from ..prover.domain import Domain
        data = _np.load(apk_path)
        vk = store.read_verify_vkey()
        apk = AccelPk(vk, Domain(agg_k),
                      list(data["fl"]), list(data["fc"]),
                      list(data["sl"]), list(data["sc"]))
        log.info("verify_run: reusing checkpointed keygen (%s)", apk_path.name)
    else:
        vk, apk = keygen_accel(agg, agg_k, aparams, spill=spill)
        store.write_verify_vkey(vk)
        if spill:
            _np.savez(apk_path,
                      fl=_np.stack(apk.fixed_lagrange),
                      fc=_np.stack(apk.fixed_coeff),
                      sl=_np.stack(apk.sigmas_lagrange),
                      sc=_np.stack(apk.sigmas_coeff))
            if fp:
                fp_path.write_text(_json.dumps(fp))
            log.info("verify_run: keygen checkpoint written")
    writer = PoseidonWrite() if transcript == "poseidon" else ShaWrite()
    proof = create_proof_accel(apk, aparams, [agg], [instances], writer,
                               seed=seed, spill=spill)
    store.write_verify_proof(proof)
    log.info("verify_run: outer proof %d bytes at k=%d (%s transcript)",
             len(proof), agg_k, transcript)
    return proof, instances


# ---------------------------------------------------------------------------
# Second recursion layer (the reference's "Multi-layer aggregator" future
# work, README.md "Furture Work"): the layer-1 aggregation proof (Poseidon
# transcript) becomes the TARGET of another aggregation circuit, compressing
# N layer-1 proofs (each compressing N target proofs) into one.
# ---------------------------------------------------------------------------

def verify_check_l1_poseidon(store: FolderStore, agg_k: int):
    """Value-context verification of a Poseidon-transcript layer-1 outer
    proof — the protocol-level gate for recursion (same engine that the
    layer-2 circuit runs in-circuit)."""
    from ..prover.srs import setup_cached_accel

    vk = store.read_verify_vkey()
    proof = store.read_verify_proof()
    instances = store.read_verify_instance()
    aparams = setup_cached_accel(agg_k)
    ctx = ValueContext()
    pchip = ValueEccChip()
    nchip = schip = pchip.scalar_chip
    t = PoseidonTranscriptRead(proof, ctx, nchip)
    cp = pv.CircuitProof(
        name="verify_circuit_l1", vk=vk, params=aparams,
        proofs=[pv.ProofData(instances=[instances], transcript=t,
                             key="verify_circuit_l1_0")])
    *_, ok = pv.verify_single_proof_in_chip(ctx, nchip, schip, pchip, cp)
    if not ok:
        raise RuntimeError("layer-1 poseidon proof failed native verification")
    log.info("verify_check_l1_poseidon: layer-1 proof verified on values")
    return True


def verify2_run(l1_store: FolderStore, l2_store: FolderStore,
                l1_k: int, l2_k: int, seed: int = 1, transcript: str = "sha"):
    """Layer-2 aggregation: verify the stored layer-1 outer proof (Poseidon
    transcript) inside a fresh aggregation circuit and prove THAT at l2_k
    (SHA transcript by default, EVM-checkable like the reference's final
    layer)."""
    from ..circuits.aggregator import (AggregatorCircuit, SingleProofWitness,
                                       VerifierCircuitTarget)
    from ..prover.srs import setup_cached_accel

    vk = l1_store.read_verify_vkey()
    proof = l1_store.read_verify_proof()
    instances = l1_store.read_verify_instance()
    aparams = setup_cached_accel(l1_k)
    target = VerifierCircuitTarget(
        name="verify_circuit_l1", vk=vk, params=aparams,
        proofs=[SingleProofWitness(instances=instances, transcript=proof)])
    agg2 = AggregatorCircuit([target])
    return _prove_aggregator(agg2, l2_store, l2_k, seed, transcript)


def verify2_check(l2_store: FolderStore, l2_k: int):
    """Natively verify the layer-2 outer proof (VerifyCheck analog)."""
    return verify_check_outer(l2_store, agg_k=l2_k)


def verify_check_outer(store: FolderStore, agg_k: int = 22):
    """Natively verify the stored outer proof (VerifyCheck::call,
    verify_circuit.rs:1032-1055): the protocol engine on the value context
    with the SHA256 transcript reader."""
    from ..protocol.transcript import ShaTranscriptRead
    from ..prover.srs import setup_cached_accel

    vk = store.read_verify_vkey()
    proof = store.read_verify_proof()
    instances = store.read_verify_instance()
    aparams = setup_cached_accel(agg_k)

    ctx = ValueContext()
    pchip = ValueEccChip()
    nchip = schip = pchip.scalar_chip
    t = ShaTranscriptRead(proof, ctx, nchip)
    cp = pv.CircuitProof(
        name="verify_circuit", vk=vk, params=aparams,
        proofs=[pv.ProofData(instances=[instances], transcript=t,
                             key="verify_circuit_0")])
    *_, ok = pv.verify_single_proof_in_chip(ctx, nchip, schip, pchip, cp)
    if not ok:
        raise RuntimeError("outer proof failed native verification")
    log.info("verify_check_outer: outer proof verified")
    return True

//! Golden-fixture generator for halo2-snark-aggregator-tpu.
//!
//! Drop this file into a checkout of scroll-tech/halo2-snark-aggregator as
//!     halo2-snark-aggregator-circuit/examples/gen_golden.rs
//! and run (toolchain nightly-2022-08-23, per the workspace rust-toolchain):
//!     cargo run --release --example gen_golden -- <output-dir>
//!
//! It proves the api crate's add_mul test circuit (K=10, 2 proofs — the
//! reference's own aggregation test workload, verify_aggregation.rs:29-30)
//! with DETERMINISTIC randomness (Pcg32 seeds below), replays the proofs
//! through the reference's verify_aggregation_proofs_in_chip on the mock
//! (value) chips with a recording transcript wrapper, and emits ONE JSON
//! file `add_mul_k10.json` containing:
//!   * the proof bytes + instances,
//!   * the vk pinned debug string (verify.rs:56-72 digest preimage) and the
//!     blake2b digest scalar,
//!   * every transcript event per proof (read_point / read_scalar /
//!     squeeze / common_scalar) with concrete values,
//!   * the per-run aggregation challenge, the aggregated (w_x, w_g) final
//!     pair, and the 136-bit packed instance vector
//!     (final_pair_to_instances, verify_circuit.rs:768-804),
//!   * the SRS verifier elements (g2, s_g2) the pairing check uses.
//!
//! The consuming tests live in the TPU repo at tests/test_golden_reference.py
//! and skip-with-reason until this file's output is copied to tests/golden/.
//!
//! Encoding: all field elements / coordinates are little-endian 32-byte hex
//! (PrimeField::to_repr). G2 coordinates are (c0, c1) pairs.

use std::cell::RefCell;
use std::fmt::Write as _;
use std::marker::PhantomData;
use std::rc::Rc;

use group::ff::PrimeField;
use group::{Curve, Group};
use halo2_proofs::arithmetic::CurveAffine;
use halo2_proofs::plonk::{create_proof, keygen_pk, keygen_vk, Error};
use halo2_proofs::poly::commitment::{Params, ParamsProver};
use halo2_proofs::poly::kzg::commitment::{KZGCommitmentScheme, ParamsKZG};
use halo2_proofs::poly::kzg::multiopen::ProverGWC;
use halo2_proofs::transcript::{Challenge255, PoseidonWrite};
use halo2curves::bn256::{Bn256, Fq, Fr, G1Affine};
use rand::SeedableRng;
use rand_pcg::Pcg32;

use halo2_snark_aggregator_api::arith::common::ArithCommonChip;
use halo2_snark_aggregator_api::mock::arith::ecc::MockEccChip;
use halo2_snark_aggregator_api::mock::arith::field::{MockChipCtx, MockFieldChip};
use halo2_snark_aggregator_api::mock::transcript_encode::PoseidonEncode;
use halo2_snark_aggregator_api::systems::halo2::transcript::PoseidonTranscriptRead;
use halo2_snark_aggregator_api::systems::halo2::verify::{
    verify_aggregation_proofs_in_chip, CircuitProof, ProofData,
};
use halo2_snark_aggregator_api::tests::systems::halo2::add_mul_test::test_circuit::test_circuit_builder;
use halo2_snark_aggregator_api::transcript::read::TranscriptRead;
use halo2_snark_aggregator_circuit::verify_circuit::final_pair_to_instances;

const K: u32 = 10;
const NPROOFS: usize = 2;

type AChip = MockEccChip<G1Affine, Error>;
type NChip = MockFieldChip<Fr, Error>;
type Inner<'a> = PoseidonTranscriptRead<&'a [u8], G1Affine, AChip, PoseidonEncode, 9, 8>;

fn hex_le(bytes: &[u8]) -> String {
    let mut s = String::with_capacity(2 * bytes.len());
    for b in bytes {
        write!(s, "{:02x}", b).unwrap();
    }
    s
}

fn fr_hex(v: &Fr) -> String {
    hex_le(v.to_repr().as_ref())
}

fn fq_hex(v: &Fq) -> String {
    hex_le(v.to_repr().as_ref())
}

fn pt_json(p: &G1Affine) -> String {
    if bool::from(p.is_identity()) {
        return "{\"inf\": true}".to_string();
    }
    let c = p.coordinates().unwrap();
    format!("{{\"x\": \"{}\", \"y\": \"{}\"}}", fq_hex(c.x()), fq_hex(c.y()))
}

fn json_escape(s: &str) -> String {
    s.replace('\\', "\\\\").replace('"', "\\\"").replace('\n', "\\n")
}

/// TranscriptRead wrapper that logs every event (with concrete mock-context
/// values) into a shared Vec of JSON object strings.
struct Rec<'a> {
    inner: Inner<'a>,
    log: Rc<RefCell<Vec<String>>>,
}

impl<'a> Rec<'a> {
    fn new(
        proof: &'a [u8],
        ctx: &mut MockChipCtx,
        nchip: &NChip,
        log: Rc<RefCell<Vec<String>>>,
    ) -> Self {
        Rec {
            inner: Inner::new(proof, ctx, nchip, 8usize, 63usize).unwrap(),
            log,
        }
    }
}

impl<'a> TranscriptRead<AChip> for Rec<'a> {
    fn read_point(
        &mut self,
        ctx: &mut MockChipCtx,
        nchip: &NChip,
        schip: &NChip,
        pchip: &AChip,
    ) -> Result<<AChip as ArithCommonChip>::AssignedValue, Error> {
        let p = self.inner.read_point(ctx, nchip, schip, pchip)?;
        self.log
            .borrow_mut()
            .push(format!("{{\"op\": \"read_point\", \"value\": {}}}", pt_json(&p.to_affine())));
        Ok(p)
    }

    fn read_scalar(
        &mut self,
        ctx: &mut MockChipCtx,
        nchip: &NChip,
        schip: &NChip,
    ) -> Result<Fr, Error> {
        let v = self.inner.read_scalar(ctx, nchip, schip)?;
        self.log
            .borrow_mut()
            .push(format!("{{\"op\": \"read_scalar\", \"value\": \"{}\"}}", fr_hex(&v)));
        Ok(v)
    }

    fn read_constant_point(
        &mut self,
        ctx: &mut MockChipCtx,
        nchip: &NChip,
        schip: &NChip,
        pchip: &AChip,
    ) -> Result<<AChip as ArithCommonChip>::AssignedValue, Error> {
        let p = self.inner.read_constant_point(ctx, nchip, schip, pchip)?;
        self.log.borrow_mut().push(format!(
            "{{\"op\": \"read_constant_point\", \"value\": {}}}",
            pt_json(&p.to_affine())
        ));
        Ok(p)
    }

    fn read_constant_scalar(
        &mut self,
        ctx: &mut MockChipCtx,
        nchip: &NChip,
        schip: &NChip,
    ) -> Result<Fr, Error> {
        let v = self.inner.read_constant_scalar(ctx, nchip, schip)?;
        self.log.borrow_mut().push(format!(
            "{{\"op\": \"read_constant_scalar\", \"value\": \"{}\"}}",
            fr_hex(&v)
        ));
        Ok(v)
    }

    fn common_point(
        &mut self,
        ctx: &mut MockChipCtx,
        nchip: &NChip,
        schip: &NChip,
        pchip: &AChip,
        p: &<AChip as ArithCommonChip>::AssignedValue,
    ) -> Result<(), Error> {
        self.log
            .borrow_mut()
            .push(format!("{{\"op\": \"common_point\", \"value\": {}}}", pt_json(&p.to_affine())));
        self.inner.common_point(ctx, nchip, schip, pchip, p)
    }

    fn common_scalar(
        &mut self,
        ctx: &mut MockChipCtx,
        nchip: &NChip,
        schip: &NChip,
        s: &Fr,
    ) -> Result<(), Error> {
        self.log
            .borrow_mut()
            .push(format!("{{\"op\": \"common_scalar\", \"value\": \"{}\"}}", fr_hex(s)));
        self.inner.common_scalar(ctx, nchip, schip, s)
    }

    fn squeeze_challenge_scalar(
        &mut self,
        ctx: &mut MockChipCtx,
        nchip: &NChip,
        schip: &NChip,
    ) -> Result<Fr, Error> {
        let v = self.inner.squeeze_challenge_scalar(ctx, nchip, schip)?;
        self.log
            .borrow_mut()
            .push(format!("{{\"op\": \"squeeze\", \"value\": \"{}\"}}", fr_hex(&v)));
        Ok(v)
    }
}

fn main() {
    let out_dir = std::env::args().nth(1).unwrap_or_else(|| ".".to_string());

    // --- deterministic prove: Pcg32-seeded SRS, witnesses, proof blinding ---
    let mut srs_rng = Pcg32::seed_from_u64(42);
    let params = ParamsKZG::<Bn256>::setup(K, &mut srs_rng);
    let constant = Fr::from(7);

    let circuit0 = test_circuit_builder(Fr::from(0), Fr::from(0));
    let vk_for_pk = keygen_vk(&params, &circuit0).expect("keygen_vk");
    let pk = keygen_pk(&params, vk_for_pk, &circuit0).expect("keygen_pk");
    let vk = pk.get_vk();

    let mut proofs_json: Vec<String> = vec![];
    let mut proof_bytes_all: Vec<Vec<u8>> = vec![];
    let mut instances_all: Vec<Vec<Vec<Vec<Fr>>>> = vec![];
    for i in 0..NPROOFS {
        let a = Fr::from(3 + i as u64);
        let b = Fr::from(5 + 2 * i as u64);
        let c = constant * a.square() * b.square();
        let circuit = test_circuit_builder(a, b);
        let instances: &[&[&[Fr]]] = &[&[&[c]]];
        let mut transcript =
            PoseidonWrite::<Vec<u8>, G1Affine, Challenge255<G1Affine>>::init(vec![]);
        create_proof::<KZGCommitmentScheme<Bn256>, ProverGWC<Bn256>, _, _, _, _>(
            &params,
            &pk,
            &[circuit],
            instances,
            Pcg32::seed_from_u64(1000 + i as u64),
            &mut transcript,
        )
        .expect("create_proof");
        let proof = transcript.finalize();
        proof_bytes_all.push(proof);
        instances_all.push(vec![vec![vec![c]]]);
    }

    // --- replay through the reference verifier on mock chips, recording ---
    let nchip = NChip::default();
    let schip = NChip::default();
    let pchip = AChip::default();
    let ctx = &mut MockChipCtx::default();
    let params_verifier = params.verifier_params();

    let logs: Vec<Rc<RefCell<Vec<String>>>> =
        (0..NPROOFS).map(|_| Rc::new(RefCell::new(vec![]))).collect();
    let agg_log = Rc::new(RefCell::new(vec![]));

    let mut pdata = vec![];
    for i in 0..NPROOFS {
        pdata.push(ProofData {
            instances: &instances_all[i],
            transcript: Rec::new(&proof_bytes_all[i][..], ctx, &nchip, logs[i].clone()),
            key: format!("p{}", i),
            _phantom: PhantomData,
        });
    }
    let empty: &[u8] = b"";
    let mut agg_transcript = Rec::new(empty, ctx, &nchip, agg_log.clone());
    let circuit_proof = CircuitProof {
        name: "add_mul".to_string(),
        vk,
        params: params_verifier,
        proofs: pdata,
    };
    let (w_x, w_g, _insts, _commits) = verify_aggregation_proofs_in_chip(
        ctx,
        &nchip,
        &schip,
        &pchip,
        vec![circuit_proof],
        &mut agg_transcript,
    )
    .expect("aggregation verify");
    let w_x = w_x.to_affine();
    let w_g = w_g.to_affine();

    // the reference's host pairing check (verify.rs:733-740) has already
    // asserted e(w_x, s_g2) * e(w_g, -g2) == 1 inside evaluate_multiopen_proof.

    let pair = (w_x, w_g, vec![]);
    let packed = final_pair_to_instances::<G1Affine, Bn256>(&pair);

    // --- vk pinned digest (verify.rs:56-72) ---
    let pinned = format!("{:?}", vk.pinned());
    use blake2b_simd::Params as Blake2bParams;
    let mut hasher = Blake2bParams::new()
        .hash_length(64)
        .personal(b"Halo2-Verify-Key")
        .to_state();
    hasher.update(&(pinned.len() as u64).to_le_bytes());
    hasher.update(pinned.as_bytes());
    let digest = Fr::from_bytes_wide(hasher.finalize().as_array());

    // --- emit JSON ---
    for i in 0..NPROOFS {
        proofs_json.push(format!(
            "{{\"bytes\": \"{}\", \"instances\": [[[\"{}\"]]], \"ops\": [\n      {}\n    ]}}",
            hex_le(&proof_bytes_all[i]),
            fr_hex(&instances_all[i][0][0][0]),
            logs[i].borrow().join(",\n      ")
        ));
    }

    let g2 = params_verifier.g2();
    let s_g2 = params_verifier.s_g2();
    let g2c = g2.coordinates().unwrap();
    let s_g2c = s_g2.coordinates().unwrap();
    let json = format!(
        "{{\n\
         \"meta\": {{\"circuit\": \"add_mul\", \"k\": {k}, \"nproofs\": {n}, \
         \"generator\": \"gen_golden.rs\", \"encoding\": \"le-hex to_repr\"}},\n\
         \"vk\": {{\"pinned\": \"{pinned}\", \"digest\": \"{digest}\"}},\n\
         \"srs\": {{\"g2\": {{\"x\": [\"{g2xc0}\", \"{g2xc1}\"], \"y\": [\"{g2yc0}\", \"{g2yc1}\"]}}, \
         \"s_g2\": {{\"x\": [\"{sg2xc0}\", \"{sg2xc1}\"], \"y\": [\"{sg2yc0}\", \"{sg2yc1}\"]}}}},\n\
         \"proofs\": [\n    {proofs}\n  ],\n\
         \"aggregation_ops\": [\n    {agg}\n  ],\n\
         \"final_pair\": {{\"w_x\": {wx}, \"w_g\": {wg}}},\n\
         \"packed_instances\": [{packed}]\n\
         }}\n",
        k = K,
        n = NPROOFS,
        pinned = json_escape(&pinned),
        digest = fr_hex(&digest),
        g2xc0 = fq_hex(&g2c.x().c0),
        g2xc1 = fq_hex(&g2c.x().c1),
        g2yc0 = fq_hex(&g2c.y().c0),
        g2yc1 = fq_hex(&g2c.y().c1),
        sg2xc0 = fq_hex(&s_g2c.x().c0),
        sg2xc1 = fq_hex(&s_g2c.x().c1),
        sg2yc0 = fq_hex(&s_g2c.y().c0),
        sg2yc1 = fq_hex(&s_g2c.y().c1),
        proofs = proofs_json.join(",\n    "),
        agg = agg_log.borrow().join(",\n    "),
        wx = pt_json(&w_x),
        wg = pt_json(&w_g),
        packed = packed
            .iter()
            .map(|v| format!("\"{}\"", fr_hex(v)))
            .collect::<Vec<_>>()
            .join(", "),
    );

    let path = std::path::Path::new(&out_dir).join("add_mul_k10.json");
    std::fs::write(&path, json).expect("write fixture");
    println!("wrote {}", path.display());
}

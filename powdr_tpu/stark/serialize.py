"""Proof (de)serialization to compact bytes.

Counterpart of the reference's proof/artifact serialization (cbor
artifacts, cli-openvm-riscv/README.md:30-41): a fixed-schema encoding of
the Proof tree into an npz container (zip of raw little-endian arrays) —
no pickling, safe to load.  Segmented (continuation) proofs store one
opening per segment under an `s{k}/` prefix."""
from __future__ import annotations

import io
from typing import List, Optional

import numpy as np

from . import pcs as pcs_mod
from .fri import FriProof, FriQuery, FriQueryLayer
from .prover import ChipProof, Proof


def _put_opening(d: dict, pre: str, op: pcs_mod.PcsOpening) -> None:
    for m, vals in enumerate(op.values):
        for p, v in enumerate(vals):
            d[f"{pre}v{m}_{p}"] = np.asarray(v, dtype=np.uint32)
    fri = op.fri
    for l, root in enumerate(fri.layer_roots):
        d[f"{pre}fr{l}"] = np.asarray(root, dtype=np.uint32)
    d[f"{pre}final_poly"] = np.asarray(fri.final_poly, dtype=np.uint32)
    d[f"{pre}pow"] = np.asarray(fri.pow_witness)
    for qi, q in enumerate(fri.queries):
        d[f"{pre}q{qi}/idx"] = np.asarray(q.index)
        for l, layer in enumerate(q.layers):
            d[f"{pre}q{qi}/l{l}/pair"] = np.asarray(layer.pair, dtype=np.uint32)
            d[f"{pre}q{qi}/l{l}/path"] = np.asarray(layer.path, dtype=np.uint32)
    for qi, pq in enumerate(op.queries):
        for m, mq in enumerate(pq.per_matrix):
            d[f"{pre}p{qi}/m{m}/lo"] = np.asarray(mq.row_lo, dtype=np.uint32)
            d[f"{pre}p{qi}/m{m}/hi"] = np.asarray(mq.row_hi, dtype=np.uint32)
            d[f"{pre}p{qi}/m{m}/plo"] = np.asarray(mq.path_lo, dtype=np.uint32)
            d[f"{pre}p{qi}/m{m}/phi"] = np.asarray(mq.path_hi, dtype=np.uint32)


def proof_to_bytes(proof: Proof) -> bytes:
    d = {}
    d["log_n"] = np.asarray(proof.log_n, dtype=np.int32)
    d["chip_widths"] = np.asarray(proof.chip_widths, dtype=np.int32)
    if proof.publics is not None:
        d["has_publics"] = np.asarray(1)
        for i, pub in enumerate(proof.publics):
            d[f"pub{i}"] = np.asarray(pub if pub else [], dtype=np.uint32)
    for i, cp in enumerate(proof.chips):
        d[f"c{i}/main"] = np.asarray(cp.main_root, dtype=np.uint32)
        d[f"c{i}/quot"] = np.asarray(cp.quotient_root, dtype=np.uint32)
        d[f"c{i}/total"] = np.asarray(cp.logup_total, dtype=np.uint32)
        if cp.perm_root is not None:
            d[f"c{i}/perm"] = np.asarray(cp.perm_root, dtype=np.uint32)
        if cp.pre_root is not None:
            d[f"c{i}/pre"] = np.asarray(cp.pre_root, dtype=np.uint32)
    if proof.segments is not None:
        d["segments"] = np.asarray(proof.segments, dtype=np.int32)
        for k, op in enumerate(proof.pcs_parts):
            _put_opening(d, f"s{k}/", op)
    else:
        _put_opening(d, "", proof.pcs)
    buf = io.BytesIO()
    np.savez_compressed(buf, **d)
    return buf.getvalue()


def _opening_size(op: pcs_mod.PcsOpening, out: dict) -> None:
    for vals in op.values:
        for v in vals:
            out["claimed_evals"] += np.asarray(v).nbytes
    fri = op.fri
    out["fri_layers"] += sum(np.asarray(r).nbytes for r in fri.layer_roots)
    out["fri_layers"] += np.asarray(fri.final_poly).nbytes + 8
    for q in fri.queries:
        out["fri_queries"] += 8 + sum(
            np.asarray(l.pair).nbytes + np.asarray(l.path).nbytes for l in q.layers
        )
    for pq in op.queries:
        for mq in pq.per_matrix:
            out["pcs_queries"] += sum(
                np.asarray(a).nbytes
                for a in (mq.row_lo, mq.row_hi, mq.path_lo, mq.path_hi)
            )


def proof_size_breakdown(proof: Proof) -> dict:
    """Raw bytes per proof component (before container compression) —
    the size-accounting surface of the reference's proof artifacts
    (ROADMAP: metrics + viewers consume this)."""
    out = {
        "commitments": 0,
        "claimed_evals": 0,
        "fri_layers": 0,
        "fri_queries": 0,
        "pcs_queries": 0,
        "publics": 0,
    }
    for cp in proof.chips:
        for r in (cp.main_root, cp.perm_root, cp.quotient_root, cp.pre_root):
            if r is not None:
                out["commitments"] += np.asarray(r).nbytes
        out["commitments"] += 16  # logup_total (4 u32)
    for pub in proof.publics or []:
        out["publics"] += 4 * len(pub or [])
    for op in proof.pcs_parts if proof.segments is not None else [proof.pcs]:
        _opening_size(op, out)
    out["total_raw"] = sum(v for k, v in out.items())
    return out


def _get_opening(z, keys, pre: str) -> pcs_mod.PcsOpening:
    values = []
    m = 0
    while f"{pre}v{m}_0" in keys:
        vals = []
        p = 0
        while f"{pre}v{m}_{p}" in keys:
            vals.append(z[f"{pre}v{m}_{p}"])
            p += 1
        values.append(vals)
        m += 1
    roots = []
    l = 0
    while f"{pre}fr{l}" in keys:
        roots.append(z[f"{pre}fr{l}"])
        l += 1
    queries = []
    qi = 0
    while f"{pre}q{qi}/idx" in keys:
        layers = []
        l = 0
        while f"{pre}q{qi}/l{l}/pair" in keys:
            layers.append(
                FriQueryLayer(
                    pair=z[f"{pre}q{qi}/l{l}/pair"], path=z[f"{pre}q{qi}/l{l}/path"]
                )
            )
            l += 1
        queries.append(FriQuery(index=int(z[f"{pre}q{qi}/idx"]), layers=layers))
        qi += 1
    fri = FriProof(
        layer_roots=roots,
        final_poly=z[f"{pre}final_poly"],
        pow_witness=int(z[f"{pre}pow"]),
        queries=queries,
    )
    pcs_queries = []
    qi = 0
    while f"{pre}p{qi}/m0/lo" in keys:
        per_matrix = []
        m = 0
        while f"{pre}p{qi}/m{m}/lo" in keys:
            per_matrix.append(
                pcs_mod.PcsMatrixQuery(
                    row_lo=z[f"{pre}p{qi}/m{m}/lo"],
                    row_hi=z[f"{pre}p{qi}/m{m}/hi"],
                    path_lo=z[f"{pre}p{qi}/m{m}/plo"],
                    path_hi=z[f"{pre}p{qi}/m{m}/phi"],
                )
            )
            m += 1
        pcs_queries.append(pcs_mod.PcsQuery(per_matrix=per_matrix))
        qi += 1
    return pcs_mod.PcsOpening(values=values, fri=fri, queries=pcs_queries)


def proof_from_bytes(data: bytes) -> Proof:
    z = np.load(io.BytesIO(data))
    keys = set(z.files)
    log_n = z["log_n"].tolist()
    n_chips = len(log_n)
    publics: Optional[List[Optional[List[int]]]] = None
    if "has_publics" in keys:
        publics = []
        for i in range(n_chips):
            arr = z[f"pub{i}"]
            publics.append([int(v) for v in arr] if arr.size else None)
    chips = []
    for i in range(n_chips):
        chips.append(
            ChipProof(
                main_root=z[f"c{i}/main"],
                perm_root=z[f"c{i}/perm"] if f"c{i}/perm" in keys else None,
                quotient_root=z[f"c{i}/quot"],
                logup_total=tuple(int(v) for v in z[f"c{i}/total"]),
                pre_root=z[f"c{i}/pre"] if f"c{i}/pre" in keys else None,
            )
        )
    segments = None
    pcs_parts = None
    opening = None
    if "segments" in keys:
        segments = z["segments"].tolist()
        pcs_parts = [_get_opening(z, keys, f"s{k}/") for k in range(len(segments))]
    else:
        opening = _get_opening(z, keys, "")
    return Proof(
        log_n=log_n,
        chip_widths=z["chip_widths"].tolist(),
        chips=chips,
        pcs=opening,
        publics=publics,
        segments=segments,
        pcs_parts=pcs_parts,
    )

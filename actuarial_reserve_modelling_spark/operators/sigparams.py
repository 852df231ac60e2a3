"""Signature-parameter fingerprints for the ``presigned=`` guards.

The ingest gates sign a batch once and hand the signed frame to the
lookup and append operators (``presigned=``).  Signatures are
deterministic in (payload, params), so a frame signed with the tier's
own parameters appends rows bitwise-identical to a fresh signing — but
a frame signed with a DIFFERENT seed and the same shape would pass the
cheap structural probes (signature length / table count) and silently
corrupt the tier (r14 verdict "what's wrong" #4).

Fix: the signing kernels stamp a params-hash into the ``sig`` column's
StructField metadata (propagates through selects, filters, semi-joins,
checkpoints and unions — verified for every transformation the gates
apply between signing and accept), and every accept site compares it
against the hash of the tier's persisted parameters.  The check is
driver-side schema inspection — zero Spark jobs.  Frames without the
stamp (hand-built, or produced before this round) fall back to the
structural probes, which remain in place.
"""

from __future__ import annotations

import hashlib
import json

from pyspark.sql import DataFrame

#: StructField-metadata key carrying the params fingerprint
SIG_PARAMS_KEY = "arm_sig_params"


def sig_params_fingerprint(**params) -> str:
    """Canonical fingerprint of a signing-parameter set. ``kind``
    namespaces the signature family (minhash vs hyperplane), so equal
    numeric params across families can never alias."""
    blob = json.dumps(params, sort_keys=True, separators=(",", ":"))
    return hashlib.md5(blob.encode("utf-8")).hexdigest()


def minhash_fingerprint(num_hashes: int, seed: int) -> str:
    """MinHash signatures depend ONLY on (token set, num_hashes, seed)
    — banding factorizations of the same num_hashes produce the same
    ``sig`` array, so the fingerprint deliberately excludes bands /
    rows_per_band (the accept sites keep their length probe, and the
    banded projection is recomputed tier-side from the persisted
    banding)."""
    return sig_params_fingerprint(
        kind="minhash-xxhash64-v1", num_hashes=int(num_hashes), seed=int(seed)
    )


def hyperplane_fingerprint(
    num_planes: int, num_tables: int, seed: int, dim: int
) -> str:
    return sig_params_fingerprint(
        kind="hyperplane-multi-v1",
        num_planes=int(num_planes),
        num_tables=int(num_tables),
        seed=int(seed),
        dim=int(dim),
    )


def check_presigned_params(
    frame: DataFrame, col: str, expected_fp: str, caller: str
) -> None:
    """Raise loudly when ``frame``'s ``col`` carries a params-hash that
    does not match ``expected_fp``. No-op (caller's structural probes
    still apply) when the frame carries no stamp."""
    try:
        md = frame.schema[col].metadata or {}
    except KeyError:
        return  # missing column fails in the caller with its own error
    got = md.get(SIG_PARAMS_KEY)
    if got is not None and got != expected_fp:
        raise ValueError(
            f"{caller}: presigned frame was signed with DIFFERENT parameters "
            f"than this tier (params-hash {got!r} != expected {expected_fp!r}) "
            "— e.g. a different seed with the same signature shape; refusing "
            "to accept mismatched signatures"
        )

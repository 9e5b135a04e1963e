"""Table sources + schema validation (SURVEY.md S1, M10, round-2 item 6).

The north_rule names Lance tables as the corpus format; this container has
no ``lance``/``pylance`` package, so ``read_documents`` is import-gated: it
uses ``ray.data.read_lance`` when (a) the path is a Lance dataset and (b)
the integration is importable, and falls back to parquet otherwise.  The
interface is what matters at 100 TB — swap-in requires no caller changes.

``check_documents_schema`` is the CheckFileType analog
(/root/reference/IB-Tool2.py:249-263): assert the corpus table matches the
input_hint shape *before* any distributed work starts, so a malformed
input fails in milliseconds, not after a cluster-wide read.
"""

from __future__ import annotations

import os

import pyarrow as pa
import ray.data as rd

# BASELINE.json input_hint: documents(doc_id:string,
#   spans: array<struct<kind:string, text:string, media_ref:string, offset:int32>>)
SPAN_FIELDS = {
    "kind": pa.string(),
    "text": pa.string(),
    "media_ref": pa.string(),
    "offset": pa.int32(),
}


class SchemaError(ValueError):
    pass


def check_documents_schema(schema: pa.Schema) -> None:
    """CheckFileType (M10): raise SchemaError unless the schema carries the
    input_hint columns (extra columns are allowed)."""
    if "doc_id" not in schema.names:
        raise SchemaError("documents: missing column 'doc_id'")
    if not pa.types.is_string(schema.field("doc_id").type):
        raise SchemaError("documents: 'doc_id' must be string, got "
                          f"{schema.field('doc_id').type}")
    if "spans" not in schema.names:
        raise SchemaError("documents: missing column 'spans'")
    t = schema.field("spans").type
    if not (pa.types.is_list(t) or pa.types.is_large_list(t)):
        raise SchemaError(f"documents: 'spans' must be a list, got {t}")
    vt = t.value_type
    if not pa.types.is_struct(vt):
        raise SchemaError(f"documents: 'spans' items must be struct, got {vt}")
    have = {vt.field(i).name: vt.field(i).type for i in range(vt.num_fields)}
    for name, want in SPAN_FIELDS.items():
        if name not in have:
            raise SchemaError(f"documents: span struct missing field '{name}'")
        if have[name] != want:
            raise SchemaError(
                f"documents: span field '{name}' must be {want}, got {have[name]}")


def is_lance_dataset(path: str) -> bool:
    return path.endswith(".lance") or os.path.isdir(os.path.join(path, "_versions"))


def read_documents(path: str, validate: bool = True) -> rd.Dataset:
    """Corpus reader: Lance when available, parquet fallback; schema checked
    at plan-build time (one metadata read, no data scan)."""
    ds = None
    if is_lance_dataset(path):
        try:
            ds = rd.read_lance(path)  # requires the lance integration
        except (ImportError, AttributeError, ModuleNotFoundError):
            ds = None
    if ds is None:
        ds = rd.read_parquet(path)
    if validate:
        check_documents_schema(pa.schema(ds.schema().base_schema))
    return ds

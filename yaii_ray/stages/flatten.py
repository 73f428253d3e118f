"""Nested-document flattening — dotted-path columns (reference M1).

Reproduces ``flattenObject`` (reference ``src/lib/internal/utils.ts:
53-120``; goldens ``test/unit/test-flat-object.ts:5-138``) on Arrow
schemas instead of JS objects:

- ``struct`` column ``value`` with child ``content.type`` becomes a
  column named ``value.content.type`` (recursively),
- ``list<struct>`` merges per-path values into lists: a column
  ``xs = [{a:1},{a:2}]`` becomes ``xs.a = [1, 2]`` (the reference's
  array-of-objects per-path merge),
- scalars/lists of scalars pass through under their own name.

Used as a vectorized ``map_batches`` stage ahead of the build when the
input has nested columns; the transcript/documents tables are already
flat so the stage is a no-op there. Float flooring and unsafe-integer
dropping (utils.ts:111-116) happen later, in the termize stage's
number path, exactly where the reference applies them (at indexing,
not at flatten).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def _flatten_array(name: str, arr: pa.Array, out: dict[str, pa.Array]) -> None:
    t = arr.type
    if pa.types.is_struct(t):
        for i in range(t.num_fields):
            f = t.field(i)
            child = pc.struct_field(arr, [i])
            _flatten_array(f"{name}.{f.name}", child, out)
        return
    if (pa.types.is_list(t) or pa.types.is_large_list(t)) and pa.types.is_struct(
        t.value_type
    ):
        vt = t.value_type
        offsets = arr.offsets
        values = arr.values
        for i in range(vt.num_fields):
            f = vt.field(i)
            child_vals = pc.struct_field(values, [i])
            child = pa.ListArray.from_arrays(offsets, child_vals)
            _flatten_array(f"{name}.{f.name}", child, out)
        return
    out[name] = arr


def flatten_batch(batch: pa.Table) -> pa.Table:
    """Table with nested columns -> flat table with dotted-path names."""
    out: dict[str, pa.Array] = {}
    for name in batch.column_names:
        col = batch[name]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        _flatten_array(name, col, out)
    return pa.table(out)

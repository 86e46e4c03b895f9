"""Feather (Arrow IPC) IO on pyarrow.

The reference reads/writes feather with polars (``prototype/loader.py``,
converters); polars is not in this image, so the data layer speaks pyarrow
directly and hands numpy dicts around.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Dict, Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.ipc as paipc


def read_feather(
    path: str | Path, columns: Optional[Sequence[str]] = None
) -> Dict[str, np.ndarray]:
    """Read a feather (Arrow IPC file) into a dict of numpy columns."""
    with pa.memory_map(str(path)) as source:
        table = paipc.open_file(source).read_all()
    if columns:
        table = table.select(list(columns))
    out: Dict[str, np.ndarray] = {}
    for name in table.column_names:
        out[name] = table.column(name).to_numpy(zero_copy_only=False)
    return out


def write_feather(path: str | Path, columns: Dict[str, np.ndarray]) -> None:
    """Write a dict of equal-length numpy columns as feather (Arrow IPC).

    The write is atomic (temp file + rename): multi-host validate() can
    assign the same wrap-padded sweep to two processes (dataset size not a
    multiple of process_count), and both then write the same shard path
    with identical content — rename makes that benign where interleaved
    direct writes could leave a truncated file. Replaces the reference's
    FileLock around shard writes (detector.py:378-380)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    table = pa.table({k: pa.array(v) for k, v in columns.items()})
    tmp = path.with_name(f".{path.name}.{os.getpid()}.tmp")
    with paipc.new_file(str(tmp), table.schema) as writer:
        writer.write_table(table)
    os.replace(tmp, path)

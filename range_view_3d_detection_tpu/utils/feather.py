"""Feather (Arrow IPC) IO on pyarrow.

The reference reads/writes feather with polars (``prototype/loader.py``,
converters); polars is not in this image, so the data layer speaks pyarrow
directly and hands numpy dicts around.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.feather as paf


def read_feather(
    path: str | Path, columns: Optional[Sequence[str]] = None
) -> Dict[str, np.ndarray]:
    """Read a feather file into a dict of numpy columns."""
    table = paf.read_table(str(path), columns=list(columns) if columns else None)
    out: Dict[str, np.ndarray] = {}
    for name in table.column_names:
        col = table.column(name)
        out[name] = col.to_numpy(zero_copy_only=False)
    return out


def write_feather(path: str | Path, columns: Dict[str, np.ndarray]) -> None:
    """Write a dict of equal-length numpy columns as feather."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    arrays = {k: pa.array(v) for k, v in columns.items()}
    table = pa.table(arrays)
    paf.write_feather(table, str(path))

"""Geometry serialization: WKT <-> WKB for point geometries.

The reference's record converters serialize geometry attributes as either
WKT strings or WKB bytes (``records/package.scala:182-194``, property
``geometry-serialization``: "text" | "binary").  The engine carries
geometries as validated WKT strings (SURVEY.md §1.3); this module adds the
WKB wire format for the point kind the web-page payload uses — vectorized
numpy inside Arrow pandas UDFs, no per-row Python arithmetic, no geometry
library dependency.

WKB layout (OGC 99-049, point): 1 byte order (01 = little-endian),
uint32 type (1 = Point), two float64 coordinates.  21 bytes per point.
"""

from __future__ import annotations

import re
import struct

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

_POINT_RE = re.compile(r"^\s*POINT\s*\(\s*(\S+)\s+(\S+)\s*\)\s*$")
_WKB_POINT_LE = b"\x01\x01\x00\x00\x00"  # little-endian, type=1


def wkb_point_bytes(x: float, y: float) -> bytes:
    """One little-endian WKB point (driver-side helper / test oracle)."""
    return _WKB_POINT_LE + struct.pack("<dd", x, y)


def wkt_point_to_wkb(col: Column | str) -> Column:
    """WKT ``POINT (x y)`` strings -> WKB binary; null / non-point -> null.

    Vectorized: coordinates parse in pandas, the 21-byte records assemble
    from one numpy buffer per batch.
    """

    @F.pandas_udf("binary")
    def _enc(s: pd.Series) -> pd.Series:
        coords = s.str.extract(_POINT_RE)
        x = pd.to_numeric(coords[0], errors="coerce")
        y = pd.to_numeric(coords[1], errors="coerce")
        ok = x.notna() & y.notna()
        n = len(s)
        buf = np.zeros((n, 21), dtype=np.uint8)
        buf[:, :5] = np.frombuffer(_WKB_POINT_LE, dtype=np.uint8)
        buf[:, 5:13] = (
            x.fillna(0.0).to_numpy(dtype="<f8").view(np.uint8).reshape(n, 8)
        )
        buf[:, 13:21] = (
            y.fillna(0.0).to_numpy(dtype="<f8").view(np.uint8).reshape(n, 8)
        )
        rows = [bytes(buf[i]) if ok.iloc[i] else None for i in range(n)]
        return pd.Series(rows)

    return _enc(F.col(col) if isinstance(col, str) else col)


def wkb_point_to_wkt(col: Column | str) -> Column:
    """WKB point binary -> WKT string (inverse; handles both byte orders),
    rendering coordinates with the shortest round-trip repr — integral
    values print without a trailing ``.0``, matching the converter's WKT
    lexical convention (``records/package.scala:182-194``)."""

    @F.pandas_udf("string")
    def _dec(s: pd.Series) -> pd.Series:
        out = []
        for b in s:
            if b is None or len(b) != 21 or b[1:5] not in (b"\x01\x00\x00\x00", b"\x00\x00\x00\x01"):
                out.append(None)
                continue
            endian = "<" if b[0] == 1 else ">"
            x, y = struct.unpack(f"{endian}dd", b[5:21])
            fx = f"{int(x)}" if x == int(x) else repr(x)
            fy = f"{int(y)}" if y == int(y) else repr(y)
            out.append(f"POINT ({fx} {fy})")
        return pd.Series(out)

    return _dec(F.col(col) if isinstance(col, str) else col)

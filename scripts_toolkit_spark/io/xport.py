"""Pure-Python SAS XPORT (Transport V5) decoder + minimal writer.

The transport format is publicly specified in SAS Technical Note TS-140:
a sequence of 80-byte records — library/member/NAMESTR/OBS header records,
140-byte NAMESTR variable descriptors, then fixed-width observation rows
whose numerics are IBM System/360 hexadecimal floating point. Everything
here is stdlib `struct` — no pyreadstat needed.

Reference parity: sas_xport_converter/converter.py:96-127 reads these
files via pyreadstat with a WINDOWS-1252 → LATIN1 encoding fallback; the
`decode_xport` entry point mirrors that fallback (whole-file decode per
encoding — a mid-file retry can never duplicate rows) and is used by
io/sources.read_xport and io/datasources.XportDataSource when pyreadstat
is unavailable. The writer exists so tests can round-trip real bytes.
"""

from __future__ import annotations

import math
import struct
from dataclasses import dataclass

import pandas as pd

RECORD = 80
NAMESTR_LEN = 140
# big-endian NAMESTR prefix: ntype nhfun nlng nvar0 nname nlabel nform
# nfl nfd nfj nfill niform nifl nifd npos (rest is filler to 140)
_NAMESTR_STRUCT = struct.Struct(">hhhh8s40s8shhh2s8shhl")

_LIB_HEADER = b"HEADER RECORD*******LIBRARY HEADER RECORD!!!!!!!"
_MEMBER_HEADER = b"HEADER RECORD*******MEMBER  HEADER RECORD!!!!!!!"
_DSCRPTR_HEADER = b"HEADER RECORD*******DSCRPTR HEADER RECORD!!!!!!!"
_NAMESTR_HEADER = b"HEADER RECORD*******NAMESTR HEADER RECORD!!!!!!!"
_OBS_HEADER = b"HEADER RECORD*******OBS     HEADER RECORD!!!!!!!"

# numeric missing sentinels: '.', '._', '.A'..'.Z' (first byte; rest zero)
_MISSING_FIRST = {0x2E, 0x5F} | set(range(0x41, 0x5B))


def ibm_to_ieee(b: bytes) -> float:
    """IBM System/360 hex float (1 sign bit, 7-bit base-16 exponent biased
    64, 56-bit fraction, no implicit bit) → IEEE double. Short numerics
    (nlng < 8) arrive zero-padded."""
    b = bytes(b).ljust(8, b"\x00")
    first = b[0]
    frac = int.from_bytes(b[1:8], "big")
    if frac == 0 and (first & 0x7F) == 0:
        return 0.0
    if first in _MISSING_FIRST and frac == 0:
        return math.nan
    sign = -1.0 if first & 0x80 else 1.0
    exp = (first & 0x7F) - 64
    return sign * (frac / float(1 << 56)) * (16.0 ** exp)


def ieee_to_ibm(x: float) -> bytes:
    """IEEE double → 8-byte IBM hex float (for the fixture writer).
    NaN encodes the standard '.' missing value."""
    if x is None or (isinstance(x, float) and math.isnan(x)):
        return b"\x2e" + b"\x00" * 7
    if x == 0:
        return b"\x00" * 8
    sign = 0x80 if x < 0 else 0x00
    m = abs(x)
    exp = 0
    while m >= 1.0:
        m /= 16.0
        exp += 1
    while m < 1.0 / 16.0:
        m *= 16.0
        exp -= 1
    frac = int(round(m * (1 << 56)))
    if frac >= 1 << 56:  # rounding overflow: renormalize
        frac >>= 4
        exp += 1
    # IBM hex float exponent is 7 bits biased by 64: exp ∈ [-64, 63].
    # Beyond ~7.2e75 the biased exponent would overflow into the sign bit
    # (silent corruption); below 16^-65 the value is a clean underflow to 0.
    if exp > 63:
        raise OverflowError(f"|{x}| exceeds IBM hex-float range (~7.2e75)")
    if exp < -64:
        return b"\x00" * 8
    return bytes([sign | (exp + 64)]) + frac.to_bytes(7, "big")


@dataclass
class XportVariable:
    name: str
    is_numeric: bool
    length: int
    position: int
    label: str = ""


def _records(data: bytes):
    if len(data) % RECORD:
        raise ValueError(f"XPORT stream length {len(data)} not a multiple of {RECORD}")
    return [data[i : i + RECORD] for i in range(0, len(data), RECORD)]


def parse_xport(data: bytes, encoding: str = "WINDOWS-1252") -> dict[str, pd.DataFrame]:
    """Parse every member dataset of a V5 transport stream into pandas
    DataFrames (numerics → float64 with NaN missings, chars → stripped
    strings). Raises ValueError on malformed structure and lets
    UnicodeDecodeError escape so callers can retry another encoding."""
    recs = _records(data)
    if not recs or not recs[0].startswith(_LIB_HEADER):
        raise ValueError("not a SAS XPORT file (missing library header record)")

    out: dict[str, pd.DataFrame] = {}
    i = 3  # library header + 2 real header records
    while i < len(recs):
        if not recs[i].startswith(_MEMBER_HEADER):
            i += 1
            continue
        namestr_len = int(recs[i][-5:].strip() or NAMESTR_LEN)
        i += 1
        if not recs[i].startswith(_DSCRPTR_HEADER):
            raise ValueError("member without DSCRPTR header record")
        i += 1
        member_name = recs[i][8:16].decode("ascii", "replace").strip() or "DATASET"
        i += 2  # two member descriptor records
        if not recs[i].startswith(_NAMESTR_HEADER):
            raise ValueError("member without NAMESTR header record")
        nvars = int(recs[i][54:58])
        i += 1

        nbytes = nvars * namestr_len
        nrecs = (nbytes + RECORD - 1) // RECORD
        blob = b"".join(recs[i : i + nrecs])
        i += nrecs
        variables: list[XportVariable] = []
        for v in range(nvars):
            chunk = blob[v * namestr_len : (v + 1) * namestr_len]
            fields = _NAMESTR_STRUCT.unpack(chunk[: _NAMESTR_STRUCT.size])
            ntype, _nhfun, nlng, _nvar0, nname, nlabel = fields[:6]
            npos = fields[-1]
            variables.append(
                XportVariable(
                    name=nname.decode("ascii", "replace").strip(),
                    is_numeric=(ntype == 1),
                    length=nlng,
                    position=npos,
                    label=nlabel.decode("ascii", "replace").strip(),
                )
            )

        if not recs[i].startswith(_OBS_HEADER):
            raise ValueError("member without OBS header record")
        i += 1

        # observations run to the next member header (or EOF), final record
        # space-padded to the 80-byte boundary
        j = i
        while j < len(recs) and not recs[j].startswith(_MEMBER_HEADER):
            j += 1
        obs = b"".join(recs[i:j])
        i = j

        row_len = sum(v.length for v in variables)
        n_rows = len(obs) // row_len if row_len else 0
        # strip trailing all-blank "rows" that are really record padding
        # (only rows overlapping the final 80-byte record can be padding)
        while (
            n_rows > 0
            and obs[(n_rows - 1) * row_len : n_rows * row_len].strip(b" ") == b""
            and n_rows * row_len > len(obs) - RECORD
        ):
            n_rows -= 1

        cols: dict[str, list] = {v.name: [] for v in variables}
        for r in range(n_rows):
            row = obs[r * row_len : (r + 1) * row_len]
            for v in variables:
                cell = row[v.position : v.position + v.length]
                if v.is_numeric:
                    cols[v.name].append(ibm_to_ieee(cell))
                else:
                    cols[v.name].append(cell.decode(encoding).rstrip())
        out[member_name] = pd.DataFrame(
            {
                v.name: pd.Series(cols[v.name], dtype="float64" if v.is_numeric else "object")
                for v in variables
            }
        )
    if not out:
        raise ValueError("XPORT stream contains no member datasets")
    return out


def decode_xport(
    data: bytes, encodings: tuple[str, ...] = ("WINDOWS-1252", "LATIN1")
) -> pd.DataFrame:
    """Reference-parity entry point (converter.py:96-127): decode the FIRST
    member, trying each encoding over the WHOLE file — a failure switches
    encoding and restarts from scratch, so a retry can never re-emit rows.
    Raises (not silently-empty) when every encoding fails."""
    last: Exception | None = None
    for enc in encodings:
        try:
            frames = parse_xport(data, encoding=enc)
            return next(iter(frames.values()))
        except UnicodeDecodeError as ex:
            last = ex
            continue
    raise ValueError(f"XPORT character data undecodable as any of {encodings}") from last


# ------------------------------------------------------------------ writer --
def _pad(rec: bytes) -> bytes:
    if len(rec) > RECORD:
        raise ValueError(f"record too long: {len(rec)}")
    return rec.ljust(RECORD, b" ")


def write_xport(
    df: pd.DataFrame,
    member_name: str = "DATA",
    char_lengths: dict[str, int] | None = None,
    encoding: str = "WINDOWS-1252",
) -> bytes:
    """Minimal single-member V5 writer — enough structure for any TS-140
    reader (this module, pyreadstat, pandas.read_sas) to round-trip the
    values. Numeric columns write full 8-byte IBM doubles; char columns
    write space-padded bytes in `encoding`."""
    ts = "01JAN26:00:00:00"  # fixed timestamp: fixtures must be byte-stable
    recs: list[bytes] = []
    recs.append(_pad(_LIB_HEADER + b"000000000000000000000000000000"))
    recs.append(_pad(b"SAS     SAS     SASLIB  9.4     Linux                   " + ts.encode()))
    recs.append(_pad(ts.encode()))
    recs.append(_pad(_MEMBER_HEADER + b"000000000000000001600000000140"))
    recs.append(_pad(_DSCRPTR_HEADER + b"000000000000000000000000000000"))
    recs.append(
        _pad(
            b"SAS     "
            + member_name.upper().encode("ascii").ljust(8)[:8]
            + b"SASDATA 9.4     Linux                   "
            + ts.encode()
        )
    )
    recs.append(_pad(ts.encode()))
    recs.append(_pad(_NAMESTR_HEADER + b"000000%04d00000000000000000000" % len(df.columns)))

    char_lengths = char_lengths or {}
    variables: list[XportVariable] = []
    pos = 0
    for col in df.columns:
        numeric = pd.api.types.is_numeric_dtype(df[col])
        if numeric:
            length = 8
        else:
            width = max(
                [len(str(x).encode(encoding)) for x in df[col].fillna("")] + [1]
            )
            length = char_lengths.get(col, width)
        variables.append(XportVariable(str(col).upper()[:8], numeric, length, pos))
        pos += length

    nblob = b""
    for idx, v in enumerate(variables, start=1):
        entry = _NAMESTR_STRUCT.pack(
            1 if v.is_numeric else 2,
            0,
            v.length,
            idx,
            v.name.encode("ascii").ljust(8)[:8],
            v.label.encode("ascii").ljust(40)[:40],
            b"        ",
            0,
            0,
            0,
            b"  ",
            b"        ",
            0,
            0,
            v.position,
        )
        nblob += entry.ljust(NAMESTR_LEN, b"\x00")
    if len(nblob) % RECORD:
        nblob += b" " * (RECORD - len(nblob) % RECORD)
    recs.append(nblob)

    recs.append(_pad(_OBS_HEADER + b"000000000000000000000000000000"))
    obs = b""
    # index rows by the ORIGINAL column names (variables[i] was built from
    # df.columns[i]); v.name is uppercased/truncated and need not match any
    # real column (e.g. mixed-case 'Rssd')
    for _, row in df.iterrows():
        for v, src_col in zip(variables, df.columns):
            if v.is_numeric:
                val = row[src_col]
                obs += ieee_to_ibm(float(val) if val is not None else math.nan)
            else:
                raw = row[src_col]
                obs += str(raw or "").encode(encoding).ljust(v.length, b" ")[: v.length]
    if len(obs) % RECORD:
        obs += b" " * (RECORD - len(obs) % RECORD)
    recs.append(obs)
    return b"".join(recs)

"""Tokenization + hash helpers pinned to their SQL oracle replicas.

Every oracled text operator must tokenize EXACTLY like the DuckDB side's
``regexp_split_to_array(trim(text), '\\s+')``:

* DuckDB ``trim`` strips SPACES only (not tabs/newlines) → Python
  ``str.strip(" ")``, never ``str.strip()``;
* RE2's ``\\s`` is ASCII ``[ \\t\\n\\f\\r]`` while Python's ``\\s`` is
  Unicode → the explicit class below;
* splitting an empty string yields ``['']`` (one empty token), and a
  string with leading non-space whitespace yields a leading ``''``
  token — conventions the SQL side produces and the Python side must
  reproduce, or the driver's hash gate diverges on such documents.

The md5-prefix hashes live here for the same reason: three samplers
share the 32-bit prefix convention with their SQL replica
``CAST(('0x' || substr(md5(text), 1, 8)) AS UBIGINT)``.
"""

from __future__ import annotations

import hashlib
import re

import pandas as pd

#: RE2 \s (ASCII) — what DuckDB's regexp_split_to_array('\s+') matches
_WS = re.compile(r"[ \t\n\f\r]+")


def sql_tokens(text: str) -> list[str]:
    """``regexp_split_to_array(trim(text), '\\s+')`` replica."""
    return _WS.split(text.strip(" "))


def tokens_series(s: pd.Series) -> pd.Series:
    """Vectorized ``sql_tokens`` over a pandas string Series (lists)."""
    return s.str.strip(" ").str.split(_WS)


def md5_prefix32(s: str) -> int:
    """First 8 md5 hex digits as an int — the SQL replica is
    ``CAST(('0x' || substr(md5(s), 1, 8)) AS UBIGINT)``."""
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

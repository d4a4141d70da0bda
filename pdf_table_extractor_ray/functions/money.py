"""Brazilian-locale money normalization kernels (F1-F4, F10 in SURVEY §2.4).

Every function documents the reference semantics it reproduces
(file:line cites into /root/reference). All return binary64 floats —
the reference uses ``float()`` everywhere, never decimal.
"""

from __future__ import annotations

import re
from typing import Optional

# --- F1: generic BR money → float -------------------------------------------
# Semantics of conversor_caixa.py:195-229 (clean_monetary_value):
#   keep only [\d.,-+CD]; debit iff 'D' or '-' present; drop D/C; if both
#   '.' and ',' → '.' is thousands sep; if only ',' → decimal comma;
#   unconvertible → None.
_KEEP_RE = re.compile(r"[^\d\.,\-+CD]")


def clean_monetary_value(value_str: Optional[str]) -> Optional[float]:
    if value_str is None:
        return None
    try:
        cleaned = _KEEP_RE.sub("", value_str)
        is_debit = "D" in value_str or "-" in value_str
        cleaned = cleaned.replace("D", "").replace("C", "")
        if "," in cleaned and "." in cleaned:
            cleaned = cleaned.replace(".", "").replace(",", ".")
        elif "," in cleaned:
            cleaned = cleaned.replace(",", ".")
        value = float(cleaned)
        if is_debit and value > 0:
            value = -value
        return value
    except (ValueError, TypeError):
        return None


def clean_monetary_values_arrow(arr):
    """Vectorized F1 over an Arrow string array — same result, bit for
    bit, as mapping ``clean_monetary_value`` (asserted by tests: both
    paths end in a correctly-rounded decimal→binary64 conversion).

    The scalar path stays as the byte-parity oracle (SURVEY §7.4);
    rows containing non-ASCII characters take it directly (Python's
    ``\\d``/``float()`` accept Unicode digits, RE2/Arrow do not — the
    fallback keeps exact parity on that long tail).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    arr = pc.cast(arr, pa.string())
    non_ascii = pc.match_substring_regex(arr, r"[^\x00-\x7F]")
    if pc.any(non_ascii).as_py():
        vals = arr.to_pylist()
        flags = non_ascii.to_pylist()
        fixed = [
            clean_monetary_value(v) if (f and v is not None) else None
            for v, f in zip(vals, flags)
        ]
        ascii_part = _clean_monetary_ascii(pc.if_else(non_ascii, pa.scalar(None, pa.string()), arr))
        return pc.if_else(non_ascii, pa.array(fixed, pa.float64()), ascii_part)
    return _clean_monetary_ascii(arr)


def _clean_monetary_ascii(arr):
    import pyarrow as pa
    import pyarrow.compute as pc

    is_debit = pc.or_(pc.match_substring(arr, "D"), pc.match_substring(arr, "-"))
    s = pc.replace_substring_regex(arr, r"[^\d\.,\-+CD]", "")
    s = pc.replace_substring(s, "D", "")
    s = pc.replace_substring(s, "C", "")
    has_comma = pc.match_substring(s, ",")
    has_dot = pc.match_substring(s, ".")
    both = pc.and_(has_comma, has_dot)
    s = pc.if_else(both, pc.replace_substring(s, ".", ""), s)
    s = pc.replace_substring(s, ",", ".")
    # exactly the strings Python float() accepts from this charset
    valid = pc.match_substring_regex(s, r"^[+-]?(\d+\.?\d*|\.\d+)$")
    v = pc.cast(pc.if_else(valid, s, pa.scalar(None, pa.string())), pa.float64())
    return pc.if_else(pc.and_(is_debit, pc.greater(v, 0.0)), pc.negate(v), v)


# --- F2a: parenthesized sign "1.234,56 (+)" → float --------------------------
# Semantics of conversor_bbmod1.py:10-35 (limpar_e_converter_valor_cac):
#   regex ([\d\.,]+)\s*\(\s*([+-])\s*\); no match → 0.0.
_PAREN_RE = re.compile(r"([\d\.,]+)\s*\(\s*([+-])\s*\)")


def parse_paren_signed(value_str: Optional[str]) -> float:
    if not value_str:
        return 0.0
    match = _PAREN_RE.search(value_str)
    if not match:
        return 0.0
    num, sign = match.groups()
    value = float(num.replace(".", "").replace(",", ".").strip())
    return -value if sign == "-" else value


# --- F2b: C/D suffix "1.234,56 D" → float ------------------------------------
# Semantics of conversor_bbmod2.py:11-22 (_limpar_e_converter_valor):
#   regex ([\d\.,]+)\s*([CD]); 'D' negates; no match → 0.0.
_CD_RE = re.compile(r"([\d\.,]+)\s*([CD])")


def parse_cd_suffix(value_str: Optional[str]) -> float:
    if not value_str:
        return 0.0
    match = _CD_RE.search(value_str)
    if not match:
        return 0.0
    num, kind = match.groups()
    value = float(num.replace(".", "").replace(",", ".").strip())
    return -value if kind == "D" else value


# --- F2c: C/D suffix kept as BR string ---------------------------------------
# Semantics of conversor_sicoobmod1.py:56-74 (formatar_valor):
#   "1.234,56D" → "-1234,56" (string, BR decimal comma, thousands dot dropped).
def format_cd_string(valor_str: str) -> str:
    is_debit = valor_str.endswith("D")
    num = valor_str[:-1]
    num = num.replace(".", "")
    return "-" + num if is_debit else num


# --- F3: trailing-hyphen sign fix --------------------------------------------
# Semantics of conversor_itau.py:68-73 (fix_hyphen): strip, drop ALL '.',
# then move a trailing '-' after "d+,d+" to the front. Order matters: the
# dot-strip happens before the hyphen move.
_HYPHEN_RE = re.compile(r"(\d+),(\d+)-$")


def fix_hyphen(value):
    if isinstance(value, str):
        value = value.strip()
        value = value.replace(".", "")
        value = _HYPHEN_RE.sub(r"-\1,\2", value)
    return value


# --- F1-variant: currency-prefixed "−R$ 1.234,56" → float --------------------
# Semantics of conversor_c6.py:10-28 (limpar_valor): negative iff '-' present
# anywhere; keep only digits and commas; ','→'.'; failure → 0.0.
_NONNUM_RE = re.compile(r"[^\d,]")


def parse_currency_prefixed(value_str) -> float:
    if not isinstance(value_str, str):
        return 0.0
    is_negative = "-" in value_str
    cleaned = _NONNUM_RE.sub("", value_str).replace(",", ".")
    try:
        value = float(cleaned)
    except (ValueError, TypeError):
        return 0.0
    return -abs(value) if is_negative else value


# --- helpers for canonical output formatting ---------------------------------


def br_format(value: float) -> str:
    """Render a float in BR format with thousands dots: 1234.5 → '1.234,50'."""
    neg = value < 0
    s = f"{abs(value):,.2f}"  # '1,234.50'
    s = s.replace(",", "\x00").replace(".", ",").replace("\x00", ".")
    return "-" + s if neg else s


def to_decimal_comma(value: float) -> str:
    """Render a float with a decimal comma and no thousands separator.

    Matches pandas ``to_csv(decimal=',')`` on float columns
    (conversor_bbmod2.py:91, conversor_c6.py:120): repr-style shortest
    float formatting with ',' for '.'.
    """
    return repr(value).replace(".", ",")

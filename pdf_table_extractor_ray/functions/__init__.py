"""Scalar kernel library (money / date / text normalizers).

Each kernel documents the reference semantics it matches
(file:line into /root/reference) and keeps an exact-parity scalar
path; vectorized variants operate on numpy / pyarrow arrays inside
``map_batches`` stages.
"""

from pdf_table_extractor_ray.functions.money import (  # noqa: F401
    clean_monetary_value,
    parse_paren_signed,
    parse_cd_suffix,
    format_cd_string,
    fix_hyphen,
    parse_currency_prefixed,
    br_format,
    to_decimal_comma,
)
from pdf_table_extractor_ray.functions.dates import (  # noqa: F401
    identify_date_pattern,
    parse_date,
    PT_MONTHS,
)
from pdf_table_extractor_ray.functions.textnorm import (  # noqa: F401
    ascii_fold,
    sanitize_column_name,
    nfkd_clean,
    extract_doc_number,
)

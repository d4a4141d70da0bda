"""Property-style checks on the normalizers (SURVEY §5 item 4)."""

from hypothesis import given, settings, strategies as hs

from pdf_table_extractor_ray.functions.money import (
    br_format,
    clean_monetary_value,
    parse_cd_suffix,
    parse_paren_signed,
)
from pdf_table_extractor_ray.functions.dates import identify_date_pattern, parse_date


# money round-trip: any cent amount formatted BR-style parses back exactly
@given(cents=hs.integers(min_value=-(10**12), max_value=10**12))
@settings(max_examples=300, deadline=None)
def test_money_roundtrip_property(cents):
    value = cents / 100.0
    s = br_format(value)
    assert clean_monetary_value(s) == value


@given(cents=hs.integers(min_value=1, max_value=10**10))
@settings(max_examples=200, deadline=None)
def test_cd_suffix_sign_property(cents):
    value = cents / 100.0
    assert parse_cd_suffix(br_format(value) + " C") == value
    assert parse_cd_suffix(br_format(value) + " D") == -value
    assert parse_paren_signed(br_format(value) + " (+)") == value
    assert parse_paren_signed(br_format(value) + " (-)") == -value


@given(
    d=hs.integers(min_value=1, max_value=28),
    m=hs.integers(min_value=1, max_value=12),
    y=hs.integers(min_value=1900, max_value=2100),
)
@settings(max_examples=200, deadline=None)
def test_date_detect_parse_property(d, m, y):
    s = f"{d:02d}/{m:02d}/{y}"
    pattern = identify_date_pattern(s)
    dt = parse_date(s, pattern)
    assert (dt.year, dt.month, dt.day) == (y, m, d)
    iso = f"{y}-{m:02d}-{d:02d}"
    dt2 = parse_date(iso, identify_date_pattern(iso))
    assert (dt2.year, dt2.month, dt2.day) == (y, m, d)


@given(
    cells=hs.lists(
        hs.one_of(
            hs.text(max_size=40),
            hs.integers(min_value=-(10**9), max_value=10**9),
            hs.floats(allow_nan=False, allow_infinity=False, width=32),
            hs.none(),
        ),
        min_size=1,
        max_size=6,
    )
)
@settings(max_examples=100, deadline=None)
def test_xlsx_roundtrip_property(cells, tmp_path_factory):
    """Any row of strings/ints/floats/nulls survives the stdlib OOXML
    writer → reader (numbers come back as float, strings exactly)."""
    import os

    from pdf_table_extractor_ray.pipelines.sinks import read_xlsx_file, write_xlsx_file

    d = tmp_path_factory.mktemp("xlsx")
    p = os.path.join(str(d), "t.xlsx")
    header = [f"c{i}" for i in range(len(cells))]
    write_xlsx_file(p, header, [cells])
    _assert_valid_sheet_xml(p)
    got_header, rows = read_xlsx_file(p)
    assert got_header == header
    for want, got in zip(cells, rows[0]):
        if want is None:
            assert got is None
        elif isinstance(want, str):
            assert got == want
        else:
            assert got == float(want)


def _assert_valid_sheet_xml(path):
    """A real XML parser must accept the sheet (the regex reader would
    happily read back raw control chars Excel rejects)."""
    import xml.etree.ElementTree as ET
    import zipfile

    with zipfile.ZipFile(path) as z:
        ET.fromstring(z.read("xl/worksheets/sheet1.xml"))


def test_xlsx_control_chars_and_nonfinite(tmp_path):
    """XML-invalid control chars are _xHHHH_-encoded (and literal
    _xHHHH_ text survives); NaN/inf become inline strings — never a
    numeric <v> Excel would reject."""
    import os

    from pdf_table_extractor_ray.pipelines.sinks import read_xlsx_file, write_xlsx_file

    p = os.path.join(str(tmp_path), "c.xlsx")
    cells = ["a\x00b\x01", "_x0041_", "tab\tok\nnl", float("nan"), float("inf"), float("-inf"), 1.5]
    write_xlsx_file(p, [f"c{i}" for i in range(len(cells))], [cells])
    _assert_valid_sheet_xml(p)
    _, rows = read_xlsx_file(p)
    got = rows[0]
    assert got[0] == "a\x00b\x01"      # control chars round-trip via _xHHHH_
    assert got[1] == "_x0041_"          # literal _xHHHH_ text is not mangled
    assert got[2] == "tab\tok\nnl"      # \t and \n are valid XML, kept raw
    assert got[3] == "nan" and got[4] == "inf" and got[5] == "-inf"
    assert got[6] == 1.5


@given(text=hs.text(max_size=200))
@settings(max_examples=300, deadline=None)
def test_clean_monetary_never_raises(text):
    out = clean_monetary_value(text)
    assert out is None or isinstance(out, float)


def test_ffill_idempotent():
    from pdf_table_extractor_ray.stages.layout import _Grid

    g = _Grid(["data", "v"], [["a", "1"], ["", "2"], ["", "3"], ["b", "4"], ["", "5"]])
    g.ffill_column("data")
    once = [r[0] for r in g.rows]
    g.ffill_column("data")
    assert [r[0] for r in g.rows] == once == ["a", "a", "a", "b", "b"]


@given(
    cents=hs.integers(min_value=-(10**11), max_value=10**11),
    suffix=hs.sampled_from(["", "D", "C", "-", " D", "R$ "]),
)
@settings(max_examples=300, deadline=None)
def test_vectorized_money_matches_scalar(cents, suffix):
    import pyarrow as pa

    from pdf_table_extractor_ray.functions.money import clean_monetary_values_arrow

    s = suffix + br_format(cents / 100.0) if suffix == "R$ " else br_format(cents / 100.0) + suffix
    want = clean_monetary_value(s)
    got = clean_monetary_values_arrow(pa.array([s])).to_pylist()[0]
    assert got == want


@given(text=hs.text(max_size=60))
@settings(max_examples=300, deadline=None)
def test_vectorized_money_matches_scalar_arbitrary(text):
    import pyarrow as pa

    from pdf_table_extractor_ray.functions.money import clean_monetary_values_arrow

    want = clean_monetary_value(text)
    got = clean_monetary_values_arrow(pa.array([text])).to_pylist()[0]
    if want is None:
        assert got is None
    else:
        assert got == want


# ---------------------------------------------------------------------------
# round-4 kernels: mojibake repair, dHash, markdown, KLL


@given(s=hs.text(max_size=200))
@settings(max_examples=300, deadline=None)
def test_mojibake_repair_inverts_break_property(s):
    """For any CLEAN text (one the repair would leave alone — text
    that itself reads as valid mojibake is inherently ambiguous, the
    same limit ftfy documents), breaking via the latin-1 mis-decode
    then repairing returns the original."""
    from pdf_table_extractor_ray.functions.charset import fix_mojibake_str

    if fix_mojibake_str(s) != s:
        return  # input is indistinguishable from mojibake — ambiguous
    broken = s.encode("utf-8").decode("latin-1")
    if broken == s:  # ASCII: break is identity, nothing to repair
        assert fix_mojibake_str(s) == s
    else:
        assert fix_mojibake_str(broken) == s


@given(s=hs.text(max_size=200))
@settings(max_examples=300, deadline=None)
def test_mojibake_repair_never_corrupts_irreversibly(s):
    """Repair of arbitrary (possibly clean) text either leaves it
    unchanged or performs a round-trip that re-breaks to the input —
    it can never invent content."""
    from pdf_table_extractor_ray.functions.charset import fix_mojibake_str

    fixed = fix_mojibake_str(s, max_passes=1)
    if fixed != s:
        assert fixed.encode("utf-8").decode("latin-1") == s


@given(
    seed=hs.integers(min_value=0, max_value=2**31),
    shift=hs.integers(min_value=0, max_value=15),
)
@settings(max_examples=100, deadline=None)
def test_dhash_shift_invariance_property(seed, shift):
    import numpy as np

    from pdf_table_extractor_ray.stages.multimodal import dhash64

    img = np.random.default_rng(seed).integers(0, 240, (18, 16, 3)).astype(np.uint8)
    assert dhash64(img) == dhash64(img + np.uint8(shift))


@given(s=hs.text(alphabet=hs.characters(blacklist_categories=("Cs",)), max_size=100))
@settings(max_examples=200, deadline=None)
def test_markdown_idempotent_collapse_property(s):
    """Rendering a paragraph twice through the collapse is a fixed
    point: md(md-output wrapped in <p>) == md-output, whenever the
    output is plain text (no markdown control chars introduced)."""
    import html as html_mod

    from pdf_table_extractor_ray.stages.markdown import html_bytes_to_markdown

    once = html_bytes_to_markdown(
        ("<p>" + html_mod.escape(s) + "</p>").encode("utf-8")
    )
    again = html_bytes_to_markdown(
        ("<p>" + html_mod.escape(once) + "</p>").encode("utf-8")
    )
    assert again == once


@given(
    vals=hs.lists(
        hs.floats(allow_nan=False, allow_infinity=False, width=32),
        min_size=1,
        max_size=400,
    )
)
@settings(max_examples=150, deadline=None)
def test_kll_small_inputs_exact_property(vals):
    """Below the sketch capacity KLL is EXACT: its q-quantile is an
    element whose rank brackets q·n."""
    import numpy as np

    from pdf_table_extractor_ray.stages.kll import KLL

    s = KLL(k=512)
    s.update_many(np.asarray(vals, np.float64))
    data = np.sort(np.asarray(vals, np.float64))
    for q in (0.0, 0.25, 0.5, 0.9, 1.0):
        est = s.quantile(q)
        assert est in data

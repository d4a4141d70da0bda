"""Registrable-domain kernel (functions/urls.py): PSL match rules."""

from pdf_table_extractor_ray.functions.urls import (
    public_suffix,
    registrable_domain,
    registrable_domains,
)


def test_simple_tlds():
    assert registrable_domain("example.com") == "example.com"
    assert registrable_domain("a.b.example.com") == "example.com"
    assert registrable_domain("EXAMPLE.ORG.") == "example.org"


def test_multi_label_suffixes():
    assert public_suffix("a.b.example.co.uk") == "co.uk"
    assert registrable_domain("a.b.example.co.uk") == "example.co.uk"
    assert registrable_domain("example.com.br") == "example.com.br"
    assert registrable_domain("www.site.gov.uk") == "site.gov.uk"
    # private-registry suffixes behave the same way
    assert registrable_domain("user.github.io") == "user.github.io"
    assert registrable_domain("deep.user.github.io") == "user.github.io"


def test_suffix_itself_not_registrable():
    assert registrable_domain("co.uk") is None
    assert registrable_domain("com") is None
    assert registrable_domain("") is None
    assert registrable_domain(None) is None


def test_wildcard_and_exception():
    # *.ck: one extra label is public → registrable needs two more
    assert public_suffix("foo.ck") == "foo.ck"
    assert registrable_domain("foo.ck") is None
    assert registrable_domain("bar.foo.ck") == "bar.foo.ck"
    # !www.ck carves www.ck back out: suffix is ck, www.ck registrable
    assert public_suffix("www.ck") == "ck"
    assert registrable_domain("www.ck") == "www.ck"
    assert registrable_domain("a.www.ck") == "www.ck"


def test_unknown_tld_implicit_star():
    assert public_suffix("x.unknowntld") == "unknowntld"
    assert registrable_domain("a.b.unknowntld") == "b.unknowntld"


def test_batch_memo():
    hosts = ["a.example.com", "a.example.com", None, "b.co.uk"]
    assert registrable_domains(hosts) == ["example.com", "example.com", None, "b.co.uk"]

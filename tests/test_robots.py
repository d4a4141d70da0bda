"""robots.txt gate (stages/robots.py): RFC 9309 parse and
longest-match semantics, actor-pool filtering."""

import pyarrow as pa

from pdf_table_extractor_ray.stages.robots import (
    CompiledRules,
    filter_by_robots,
    parse_robots,
    synth_robots_corpus,
)


def test_parse_groups_and_agent_fallback():
    body = (
        b"# comment\n"
        b"User-agent: googlebot\n"
        b"Disallow: /g\n"
        b"\n"
        b"User-agent: a\n"
        b"User-agent: b\n"
        b"Disallow: /shared\n"
        b"\n"
        b"User-agent: *\n"
        b"Disallow: /default\n"
    )
    assert parse_robots(body, "googlebot") == [(False, "/g")]
    assert parse_robots(body, "A") == [(False, "/shared")]
    assert parse_robots(body, "b") == [(False, "/shared")]
    assert parse_robots(body, "unknown") == [(False, "/default")]


def test_empty_disallow_allows_all():
    assert parse_robots(b"User-agent: *\nDisallow:\n") == []
    assert CompiledRules([]).allowed("/anything")


def test_longest_match_and_allow_tie():
    rules = CompiledRules(parse_robots(b"User-agent: *\nDisallow: /private/\nAllow: /private/ok\n"))
    assert rules.allowed("/public")
    assert not rules.allowed("/private/x")
    assert rules.allowed("/private/okay")  # longer Allow wins
    # exact tie: Allow wins
    tie = CompiledRules([(False, "/p"), (True, "/p")])
    assert tie.allowed("/pq")


def test_wildcard_and_anchor():
    rules = CompiledRules(parse_robots(b"User-agent: *\nDisallow: /*.tmp$\n"))
    assert not rules.allowed("/a/b.tmp")
    assert rules.allowed("/a/b.tmp.html")  # $ anchors
    blanket = CompiledRules(parse_robots(b"User-agent: *\nDisallow: /\nAllow: /p1*\n"))
    assert blanket.allowed("/p1x/deep")
    assert not blanket.allowed("/p2")


def test_filter_by_robots_actor_stage(ray_session):
    import ray.data

    robots = pa.table(
        {
            "host": pa.array(["a.test"], pa.string()),
            "robots": pa.array([b"User-agent: *\nDisallow: /no\n"], pa.binary()),
        }
    )
    urls = pa.table(
        {
            "url": pa.array(
                [
                    "https://a.test/yes",
                    "https://a.test/no/page",
                    "https://unknown.test/no/page",  # no robots row: allowed
                ],
                pa.string(),
            )
        }
    )
    rows = filter_by_robots(ray.data.from_arrow(urls), robots, concurrency=1).take_all()
    got = {r["url"]: r["allowed"] for r in rows}
    assert got == {
        "https://a.test/yes": True,
        "https://a.test/no/page": False,
        "https://unknown.test/no/page": True,
    }


def test_synth_robots_corpus_shapes():
    tbl = synth_robots_corpus(10)
    hosts = tbl.column("host").to_pylist()
    assert "site3.test" not in hosts and "site8.test" not in hosts  # mode 3: absent
    assert "site0.test" in hosts and "site1.test" in hosts


def test_parse_robots_sitemaps_group_independent():
    from pdf_table_extractor_ray.stages.robots import parse_robots_sitemaps

    txt = (
        b"Sitemap: https://a.test/s1.xml\n"
        b"User-agent: bot\nDisallow: /x\n"
        b"sitemap: https://a.test/s2.xml  # inside a group, still valid\n"
        b"User-agent: *\nAllow: /\n"
        b"SITEMAP:https://a.test/s3.xml\n"
        b"Sitemap:\n"  # empty value: ignored
    )
    assert parse_robots_sitemaps(txt) == [
        "https://a.test/s1.xml",
        "https://a.test/s2.xml",
        "https://a.test/s3.xml",
    ]


def test_sitemap_discovery_feeds_sitemap_source():
    """Composition: robots discovery names the sitemap, the sitemap
    source parses its content."""
    from pdf_table_extractor_ray.sources.sitemap import (
        parse_sitemap,
        write_sitemap_xml,
    )
    from pdf_table_extractor_ray.stages.robots import parse_robots_sitemaps

    blob = write_sitemap_xml([("https://a.test/p1", "2025-01-01", None, None)])
    robots = b"User-agent: *\nDisallow:\nSitemap: https://a.test/s.xml\n"
    catalog = {"https://a.test/s.xml": blob}
    found = parse_robots_sitemaps(robots)
    assert found == ["https://a.test/s.xml"]
    entries = list(parse_sitemap(catalog[found[0]]))
    assert entries[0][1] == "https://a.test/p1"

"""URL layer (operators/urls.py): normalization parity with a Python
urllib replica of the module contract, registered-domain heuristic,
broadcast domain filtering with NULL semantics, dedup winners, and a
structured URL fuzz.
"""

from __future__ import annotations

import contextlib
import io
import re
from urllib.parse import urlsplit

import pytest
from hypothesis import given, settings, strategies as st

from kafka_avro_order_processing_spark.operators.urls import (
    TRACKING_PARAMS_REGEX,
    domain_filter,
    normalize_url,
    url_dedup,
    url_domains,
)


def _py_normalize(url):
    """Python replica of the documented contract (urlsplit-based)."""
    if url is None:
        return None
    u = url.strip()
    try:
        s = urlsplit(u)
    except ValueError:
        return None
    if not s.scheme or not s.hostname:
        return None
    scheme = s.scheme.lower()
    host = s.hostname.lower()
    port = ""
    m = re.search(r":([0-9]+)$", s.netloc)
    if m and int(m.group(1)) > 2**31 - 1:
        # JVM-parser validity gate (module contract): java.net.URI
        # holds the port in an int, so an overflowing port makes the
        # whole URL malformed -> NULL.  urlsplit would parse it.
        return None
    try:
        p = s.port
    except ValueError:
        p = None  # out of range 0-65535 -> dropped
    if p is not None and not (
        (scheme == "http" and p == 80) or (scheme == "https" and p == 443)
    ):
        port = f":{p}"
    path = s.path or "/"
    kept = [
        q
        for q in (s.query.split("&") if s.query else [])
        if q and not re.match(TRACKING_PARAMS_REGEX, q)
    ]
    qpart = "?" + "&".join(kept) if kept else ""
    return f"{scheme}://{host}{port}{path}{qpart}"


CASES = [
    "HTTP://Example.COM:80/Path/Here?a=1&utm_source=x&b=2#frag",
    "https://a.b.co.uk:443/",
    "https://a.b.co.uk:8443/x?utm_campaign=z",
    "http://user:pw@Host.org/secret",
    "http://h.com",
    "http://h.com/?utm_source=1&UTM_MEDIUM=2",
    "  http://pad.io/p  ",
    "http://site.io/a?gclid=g&keep=1&fbclid=f&z=9",
    "http://num.net:8080/q?x=1&x=1",
    # ADVICE r7: ports compare as INTs, not strings
    "http://h.com:0080/x",        # zero-padded default -> stripped
    "https://h.com:000443/x",     # zero-padded default -> stripped
    "http://h.com:08080/x",       # zero-padded non-default -> ':8080'
    "http://h.com:99999/x",       # out of range -> dropped (urllib ValueError)
    "http://h.com:123456789012345/x",  # int overflow -> dropped
    "http://h.com:0/x",           # port 0 is in range -> kept as ':0'
]


def test_normalize_matches_python_contract(spark):
    rows = [(i, u) for i, u in enumerate(CASES)]
    df = spark.createDataFrame(rows, "id long, url string")
    got = {r["id"]: r["url_norm"] for r in normalize_url(df).collect()}
    for i, u in rows:
        assert got[i] == _py_normalize(u), u


def test_normalize_invalid_is_null(spark):
    df = spark.createDataFrame(
        [(1, "not a url"), (2, "/relative/only"), (3, None)], "id long, url string"
    )
    got = {r["id"]: r["url_norm"] for r in normalize_url(df).collect()}
    assert got == {1: None, 2: None, 3: None}


def test_registered_domain(spark):
    hosts = [
        ("http://www.example.com/x", "example.com"),
        ("http://a.b.co.uk/x", "b.co.uk"),
        ("http://co.uk/x", "co.uk"),
        ("http://deep.sub.site.org/x", "site.org"),
        ("http://localhost/x", "localhost"),
        ("http://x.com.au/", "x.com.au"),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(hosts)], "id long, url string"
    )
    got = {r["id"]: r["domain"] for r in url_domains(df).collect()}
    for i, (_, want) in enumerate(hosts):
        assert got[i] == want, hosts[i]


def test_domain_filter_modes_and_nulls(spark):
    df = spark.createDataFrame(
        [
            (1, "http://spam.example.com/a"),
            (2, "http://good.org/b"),
            (3, "garbage"),  # NULL domain
        ],
        "id long, url string",
    )
    bl = spark.createDataFrame([("example.com",)], "domain string")
    blocked = sorted(r["id"] for r in domain_filter(df, bl, mode="block").collect())
    assert blocked == [2, 3]  # NULL-domain row survives block mode
    allowed = sorted(r["id"] for r in domain_filter(df, bl, mode="allow").collect())
    assert allowed == [1]  # NULL-domain row dropped in allow mode
    with pytest.raises(ValueError):
        domain_filter(df, bl, mode="deny")


def test_domain_filter_broadcasts(spark):
    df = spark.createDataFrame([(1, "http://a.com/")], "id long, url string")
    bl = spark.createDataFrame([("a.com",)], "domain string")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        domain_filter(df, bl).explain("formatted")
    assert "BroadcastHashJoin" in buf.getvalue()


def test_url_dedup_keeps_min_id_and_singleton_nulls(spark):
    df = spark.createDataFrame(
        [
            (5, "http://H.com:80/x?utm_source=a"),
            (3, "http://h.com/x"),          # same canonical as 5 -> 3 wins
            (7, "http://h.com/y"),
            (9, "bad url"),
            (11, "also bad"),
        ],
        "doc_id long, url string",
    )
    got = sorted(r["doc_id"] for r in url_dedup(df).collect())
    assert got == [3, 7, 9, 11]


def test_plan_is_jvm_only(spark):
    df = spark.createDataFrame([(1, "http://a.com/")], "id long, url string")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        normalize_url(df).explain("formatted")
    plan = buf.getvalue()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


SCHEMES = st.sampled_from(["http", "HTTP", "https", "HtTpS"])
HOSTS = st.sampled_from(
    ["Example.com", "a.b.co.uk", "x.io", "deep.sub.site.org", "h.com.au"]
)
PORTS = st.sampled_from(["", ":80", ":443", ":8080", ":0080", ":00443", ":99999", ":0"])
PATHS = st.sampled_from(["", "/", "/A/b", "/x%20y"])
QUERIES = st.lists(
    st.sampled_from(["a=1", "utm_source=x", "b=2", "gclid=9", "UTM_x=1", "keep=yes"]),
    min_size=0,
    max_size=4,
)
FRAGS = st.sampled_from(["", "#f", "#sec-2"])


@settings(max_examples=40, deadline=None)
@given(SCHEMES, HOSTS, PORTS, PATHS, QUERIES, FRAGS)
@pytest.mark.slow
def test_fuzz_structured_urls(spark, scheme, host, port, path, qs, frag):
    url = f"{scheme}://{host}{port}{path}"
    if qs:
        url += "?" + "&".join(qs)
    url += frag
    df = spark.createDataFrame([(1, url)], "id long, url string")
    got = normalize_url(df).collect()[0]["url_norm"]
    assert got == _py_normalize(url), url


# ---------------------------------------------------------------------------
# Table-driven registered domain (publicsuffix.org rule semantics)
# ---------------------------------------------------------------------------

PSL_RULES = [
    "com", "uk", "co.uk", "org.uk", "au", "com.au",
    "jp", "co.jp",
    "ck", "*.ck", "!www.ck",          # the spec's canonical wildcard+exception
    "kobe.jp", "*.kobe.jp", "!city.kobe.jp",
]


def _py_registered_domain(host):
    """Python replica of the publicsuffix.org algorithm over PSL_RULES."""
    if not host:
        return None
    labels = host.lower().split(".")
    best = 1  # implicit '*' rule
    exception = None
    for rule in PSL_RULES:
        if rule.startswith("!"):
            body = rule[1:].split(".")
            if labels[-len(body):] == body:
                exception = len(body) - 1
        elif rule.startswith("*."):
            body = rule[2:].split(".")
            depth = len(body) + 1
            if len(labels) >= depth and labels[-len(body):] == body:
                best = max(best, depth)
        else:
            body = rule.split(".")
            if len(labels) >= len(body) and labels[-len(body):] == body:
                best = max(best, len(body))
    suf = exception if exception is not None else best
    if len(labels) < suf + 1:
        return None
    return ".".join(labels[-(suf + 1):])


PSL_HOSTS = [
    "www.example.com",        # exact 'com' -> example.com
    "a.b.co.uk",              # multi-level suffix -> b.co.uk
    "x.com.au",               # multi-level suffix -> x.com.au (host IS reg dom)
    "deep.sub.x.com.au",      # -> x.com.au
    "co.uk",                  # host IS a public suffix -> NULL
    "uk",                     # bare TLD -> NULL
    "foo.ck",                 # wildcard '*.ck': foo.ck is public -> NULL
    "bar.foo.ck",             # -> bar.foo.ck
    "baz.bar.foo.ck",         # -> bar.foo.ck
    "www.ck",                 # exception '!www.ck' -> www.ck
    "sub.www.ck",             # exception still prevails -> www.ck
    "a.b.kobe.jp",            # wildcard '*.kobe.jp' -> a.b.kobe.jp
    "city.kobe.jp",           # exception -> city.kobe.jp
    "x.city.kobe.jp",         # -> city.kobe.jp
    "unknownTLD-host.zz",     # implicit '*' -> unknowntld-host.zz
    "single",                 # one label, no extra label -> NULL
    "localhost",              # NULL (no label past the implicit suffix)
]


def test_domains_from_suffix_table_matches_psl_algorithm(spark):
    from kafka_avro_order_processing_spark.operators.urls import (
        domains_from_suffix_table,
    )

    psl = spark.createDataFrame([(s,) for s in PSL_RULES], "suffix string")
    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(PSL_HOSTS)], "id long, host string"
    )
    got = {r["id"]: r["domain"] for r in domains_from_suffix_table(df, psl).collect()}
    for i, h in enumerate(PSL_HOSTS):
        assert got[i] == _py_registered_domain(h), (h, got[i], _py_registered_domain(h))


def test_domains_from_suffix_table_null_host_and_cap(spark, monkeypatch):
    import pytest

    from kafka_avro_order_processing_spark.operators import urls as U

    psl = spark.createDataFrame([(s,) for s in PSL_RULES], "suffix string")
    df = spark.createDataFrame([(1, None), (2, "")], "id long, host string")
    got = {r["id"]: r["domain"] for r in U.domains_from_suffix_table(df, psl).collect()}
    assert got == {1: None, 2: None}

    monkeypatch.setattr(U, "MAX_PSL_RULES", 3)
    with pytest.raises(ValueError, match="MAX_PSL_RULES"):
        U.domains_from_suffix_table(df, psl)


def test_domains_from_suffix_table_is_jvm_only_no_shuffle(spark):
    from kafka_avro_order_processing_spark.operators.urls import (
        domains_from_suffix_table,
    )

    psl = spark.createDataFrame([(s,) for s in PSL_RULES], "suffix string")
    df = spark.createDataFrame([(1, "a.b.co.uk")], "id long, host string")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        domains_from_suffix_table(df, psl).explain("formatted")
    plan = buf.getvalue()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan  # pure map-side expression work


def test_url_domains_and_filter_accept_psl(spark):
    from kafka_avro_order_processing_spark.operators.urls import (
        url_domains as _ud,
    )

    psl = spark.createDataFrame([(s,) for s in PSL_RULES], "suffix string")
    df = spark.createDataFrame(
        [
            (1, "http://a.b.kobe.jp/x"),     # wildcard: a.b.kobe.jp
            (2, "http://x.city.kobe.jp/y"),  # exception: city.kobe.jp
            (3, "http://deep.a.b.co.uk/z"),  # multi-level: b.co.uk
        ],
        "id long, url string",
    )
    got = {r["id"]: r["domain"] for r in _ud(df, psl=psl).collect()}
    assert got == {1: "a.b.kobe.jp", 2: "city.kobe.jp", 3: "b.co.uk"}

    bl = spark.createDataFrame([("city.kobe.jp",)], "domain string")
    kept = sorted(
        r["id"] for r in domain_filter(df, bl, mode="block", psl=psl).collect()
    )
    assert kept == [1, 3]  # the heuristic would NOT block x.city.kobe.jp
    kept_h = sorted(r["id"] for r in domain_filter(df, bl, mode="block").collect())
    assert 2 in kept_h  # heuristic sees kobe.jp as the domain -> no match


# ---------------------------------------------------------------------------
# Vendored public-suffix excerpt (the published list's own rules,
# data/public_suffix_excerpt.dat — r8 verdict task 4)
# ---------------------------------------------------------------------------


def _py_registered_domain_rules(host, rules):
    """The PSL_RULES replica, parameterized by rule list."""
    if not host:
        return None
    labels = host.lower().split(".")
    best = 1
    exception = None
    for rule in rules:
        if rule.startswith("!"):
            body = rule[1:].split(".")
            if labels[-len(body):] == body:
                exception = len(body) - 1
        elif rule.startswith("*."):
            body = rule[2:].split(".")
            depth = len(body) + 1
            if len(labels) >= depth and labels[-len(body):] == body:
                best = max(best, depth)
        else:
            body = rule.split(".")
            if len(labels) >= len(body) and labels[-len(body):] == body:
                best = max(best, len(body))
    suf = exception if exception is not None else best
    if len(labels) < suf + 1:
        return None
    return ".".join(labels[-(suf + 1):])


def test_vendored_psl_excerpt_parses():
    from kafka_avro_order_processing_spark.operators.urls import load_psl_rules

    rules = load_psl_rules()
    assert len(rules) > 80
    assert all(r and not r.startswith("//") for r in rules)
    # the published blocks the tests rely on are present verbatim
    for r in ("*.ck", "!www.ck", "*.kobe.jp", "!city.kobe.jp", "co.uk",
              "*.sch.uk", "s3.dualstack.us-east-1.amazonaws.com",
              "github.io", "blogspot.com"):
        assert r in rules, r
    # no bare 'ck' rule: the published list covers .ck ONLY via the
    # wildcard (the synthetic fixture had added one)
    assert "ck" not in rules


VENDORED_HOSTS = [
    # the spec's canonical wildcard + exception block
    ("foo.ck", None),                      # *.ck makes foo.ck public
    ("bar.foo.ck", "bar.foo.ck"),
    ("www.ck", "www.ck"),                  # !www.ck carve-out
    ("sub.www.ck", "www.ck"),
    # Japanese designated-city wildcards
    ("a.b.kobe.jp", "a.b.kobe.jp"),
    ("city.kobe.jp", "city.kobe.jp"),
    ("x.city.kobe.jp", "city.kobe.jp"),
    ("x.city.yokohama.jp", "city.yokohama.jp"),
    ("shop.nagoya.jp", None),              # *.nagoya.jp: it IS public
    ("x.shop.nagoya.jp", "x.shop.nagoya.jp"),
    ("www.city.sendai.jp", "city.sendai.jp"),
    # prefecture exact rules
    ("x.tokyo.jp", "x.tokyo.jp"),
    ("www.metro.tokyo.jp", "metro.tokyo.jp"),
    # uk block incl. the *.sch.uk wildcard
    ("a.b.co.uk", "b.co.uk"),
    ("x.somewhere.sch.uk", "x.somewhere.sch.uk"),
    ("somewhere.sch.uk", None),
    ("www.police.uk", "www.police.uk"),
    # multi-label PRIVATE-section entries: the registered domain is
    # suffix + 1 even six labels deep
    ("bucket.s3.dualstack.us-east-1.amazonaws.com",
     "bucket.s3.dualstack.us-east-1.amazonaws.com"),
    ("x.bucket.s3.dualstack.us-east-1.amazonaws.com",
     "bucket.s3.dualstack.us-east-1.amazonaws.com"),
    ("site.s3-website-us-east-1.amazonaws.com",
     "site.s3-website-us-east-1.amazonaws.com"),
    ("mybucket.s3.amazonaws.com", "mybucket.s3.amazonaws.com"),
    ("user.github.io", "user.github.io"),
    ("x.user.github.io", "user.github.io"),
    ("myblog.blogspot.com", "myblog.blogspot.com"),
    # plain gTLD / wildcard-only ccTLD / unknown TLD
    ("www.example.com", "example.com"),
    ("gov.bd", None),                      # *.bd: gov.bd is public
    ("ministry.gov.bd", "ministry.gov.bd"),
    ("unknown.zz", "unknown.zz"),          # implicit '*' default
    ("amazonaws.com", "amazonaws.com"),    # suffix is s3.*, com applies
]


def test_vendored_psl_registered_domains(spark):
    from kafka_avro_order_processing_spark.operators.urls import (
        domains_from_suffix_table,
        load_psl_rules,
        psl_excerpt_frame,
    )

    rules = load_psl_rules()
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(VENDORED_HOSTS)],
        "id long, host string",
    )
    got = {
        r["id"]: r["domain"]
        for r in domains_from_suffix_table(df, psl_excerpt_frame(spark)).collect()
    }
    for i, (h, want) in enumerate(VENDORED_HOSTS):
        assert got[i] == want, (h, got[i], want)
        # and the Python replica of the published algorithm agrees
        assert _py_registered_domain_rules(h, rules) == want, h

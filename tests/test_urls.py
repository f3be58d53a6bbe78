"""URL parse/canonicalize/domain semantics (operators/urls.py):
crafted-URL behavior pins for every canonicalization rule, PSL-head
registered-domain cases, and grouped domain-census arithmetic."""

import pytest
from pyspark.sql import functions as F

from simple_anonymizer_spark.operators import urls as U


def _parse(spark, url):
    df = spark.createDataFrame([(1, url)], "doc_id long, url string")
    return U.parse_urls(df).first()


def test_rfc3986_parts_and_lowercasing(spark):
    r = _parse(spark, "HTTPS://User:pw@WWW.Ex.COM:8443/A/B?x=1#frag")
    assert r.scheme == "https"
    assert r.host == "www.ex.com"          # userinfo and port stripped
    assert r.path == "/A/B"                # path case preserved
    assert r.path_depth == 2
    assert r.url_canonical == "https://www.ex.com:8443/A/B?x=1"


def test_default_ports_drop_nondefault_kept(spark):
    assert _parse(spark, "http://a.com:80/x").url_canonical == \
        "http://a.com/x"
    assert _parse(spark, "https://a.com:443/x").url_canonical == \
        "https://a.com/x"
    assert _parse(spark, "http://a.com:8080/x").url_canonical == \
        "http://a.com:8080/x"
    # scheme-mismatched default port is NOT default
    assert _parse(spark, "http://a.com:443/x").url_canonical == \
        "http://a.com:443/x"


def test_tracking_params_drop_and_keys_sort(spark):
    r = _parse(spark, "http://a.com/p?utm_source=x&b=2&gclid=1&a=1"
                      "&fbclid=z&ref=top&utm_medium=y")
    assert r.url_canonical == "http://a.com/p?a=1&b=2"
    # all params tracking -> no '?' at all; fragment always drops
    assert _parse(spark, "http://a.com/p?utm_source=x#sec").url_canonical \
        == "http://a.com/p"


def test_empty_path_gets_root_slash(spark):
    assert _parse(spark, "https://a.com").url_canonical == "https://a.com/"
    assert _parse(spark, "https://a.com?v=2").url_canonical == \
        "https://a.com/?v=2"


@pytest.mark.parametrize("host,domain", [
    ("www.example.com", "example.com"),
    ("a.b.deep.example.org", "example.org"),
    ("news.bbc.co.uk", "bbc.co.uk"),        # PSL-head 3-label rule
    ("shop.site.com.au", "site.com.au"),
    ("example.com", "example.com"),
    ("localhost", "localhost"),             # <=2 labels pass through
    ("co.uk", "co.uk"),
])
def test_registered_domain_rules(spark, host, domain):
    df = spark.createDataFrame([(host,)], "h string")
    assert df.select(U.registered_domain("h").alias("d")).first().d == domain


def test_domain_stats_census(spark):
    rows = [
        (1, "https://a.x.com/p/q"),
        (2, "http://b.x.com/p"),
        (3, "https://a.x.com/p/q?utm_source=t"),  # same canonical as 1
        (4, "https://only.y.org/"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {r.domain: r for r in U.url_domain_stats(df).collect()}
    x = got["x.com"]
    assert (x.n_urls, x.n_hosts, x.n_canonical, x.n_https) == (3, 2, 2, 2)
    assert x.avg_path_depth == pytest.approx(5 / 3)
    y = got["y.org"]
    assert (y.n_urls, y.n_hosts, y.n_canonical, y.n_https) == (1, 1, 1, 1)
    assert y.avg_path_depth == 0.0


def test_parse_is_pure_projection(spark):
    df = spark.createDataFrame([(1, "http://a.com/x")],
                               "doc_id long, url string")
    plan = U.parse_urls(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan           # no shuffle: fused projection
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan

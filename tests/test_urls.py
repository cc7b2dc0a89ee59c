"""Canonicalizer unit tests — golden vectors lifted from the reference's
UrlUtilsTest.java:25-48 semantics (cited, not copied)."""

from warcbase_spark.functions.urls import (
    canonicalize,
    get_file_type,
    host_of_key,
    key_to_url,
    reverse_hostname,
    url_to_key,
)


def test_url_to_key_golden():
    # UrlUtilsTest.java:25-31
    assert (
        url_to_key("http://www.house.gov/mthompson/the_1st_district.htm")
        == "gov.house.www/mthompson/the_1st_district.htm"
    )


def test_reverse_hostname_vectors():
    # UrlUtilsTest.java:34-48
    assert reverse_hostname("www.house.gov") == "gov.house.www"
    assert reverse_hostname("foo.bar.com:8080") == "com.bar.foo:8080"
    assert reverse_hostname("com") == "com"
    # involution
    assert reverse_hostname(reverse_hostname("a.b.c.d")) == "a.b.c.d"


def test_rfc3986_normalization():
    assert canonicalize("HTTP://Example.COM:80/a/./b/../c.html") == "http://example.com/a/c.html"
    assert canonicalize("https://example.com:443/") == "https://example.com/"
    assert canonicalize("https://example.com:8443/x") == "https://example.com:8443/x"
    assert canonicalize("http://example.com/%7Euser/%41") == "http://example.com/~user/A"
    assert canonicalize("http://example.com/a#frag") == "http://example.com/a"
    assert canonicalize("http://example.com") == "http://example.com/"


def test_invalid_urls_null():
    # invalid → null → counted, mirroring IngestFiles.java:137-141 skip behavior
    for bad in [None, "", "dns:example.com", "not a url", "mailto:x@y.z", "http://"]:
        assert url_to_key(bad) is None


def test_key_roundtrip():
    key = url_to_key("http://www.house.gov/a/b.htm?x=1")
    assert key == "gov.house.www/a/b.htm?x=1"
    assert key_to_url("gov.house.www/a/b.htm") == "http://www.house.gov/a/b.htm"
    assert host_of_key("gov.house.www/a/b.htm") == "www.house.gov"


def test_messy_equivalents_share_key():
    clean = url_to_key("http://hot0.example.org/p/3.html")
    assert url_to_key("HTTP://Hot0.Example.ORG:80/p/3.html") == clean
    assert url_to_key("http://hot0.example.org/./p/3.html") == clean
    assert url_to_key("http://hot0.example.org/x/../p/3.html") == clean


def test_get_file_type():
    # UrlUtils.java:74-89: ≤8 chars, not a bare digit
    assert get_file_type("http://a.b/c/d.html") == "html"
    assert get_file_type("http://a.b/c/d.HTML?x=1") == "html"
    assert get_file_type("http://a.b/c/d") is None
    assert get_file_type("http://a.b/c/d.1") is None
    assert get_file_type("http://a.b/c/d.verylongext123") is None

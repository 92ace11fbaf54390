"""URL canonicalization (functions/url.py): each frozen rule plus
passthrough and vectorized batch behavior."""

import pandas as pd

from pdf_extract_ray.functions.url import canonicalize_batch, canonicalize_urls


def canon1(u):
    return canonicalize_urls(pd.Series([u])).iloc[0].to_dict()


def test_case_port_fragment_tracking_sort():
    got = canon1("HTTP://WWW.Example.COM:80/Path/X?utm_source=f&b=2&a=1#frag")
    assert got["canonical_url"] == "http://www.example.com/Path/X?a=1&b=2"
    assert got["url_host"] == "www.example.com"
    assert got["url_domain"] == "example.com"


def test_https_443_and_non_default_port_kept():
    assert canon1("https://a.org:443/x")["canonical_url"] == "https://a.org/x"
    got = canon1("https://a.org:8443/x")
    assert got["canonical_url"] == "https://a.org:8443/x"
    assert got["url_host"] == "a.org"  # host column strips ANY port


def test_port_80_only_stripped_for_http():
    assert canon1("https://a.org:80/x")["canonical_url"] == "https://a.org:80/x"


def test_empty_path_and_query_handling():
    assert canon1("http://A.net")["canonical_url"] == "http://a.net/"
    assert canon1("http://a.net/?")["canonical_url"] == "http://a.net/"
    assert canon1("http://a.net/p?fbclid=1&gclid=2&utm_x=3")["canonical_url"] \
        == "http://a.net/p"


def test_path_case_preserved():
    assert canon1("http://a.net/CaseSensitive")["canonical_url"] \
        == "http://a.net/CaseSensitive"


def test_non_url_passthrough():
    got = canon1("  just words  ")
    assert got == {"canonical_url": "just words", "url_host": "",
                   "url_domain": ""}
    got = canonicalize_urls(pd.Series([None])).iloc[0]
    assert got["canonical_url"] == ""


def test_batch_alignment_with_mixed_rows():
    b = pd.DataFrame({
        "doc_id": [7, 8, 9],
        "url": ["http://B.com:80/?z=1&a=2", "nope", None],
    })
    out = canonicalize_batch(b)
    assert out["canonical_url"].tolist() == [
        "http://b.com/?a=2&z=1", "nope", ""]
    assert out["doc_id"].tolist() == [7, 8, 9]


def test_url_features_rules():
    import pandas as pd

    from pdf_extract_ray.functions.url import url_features

    s = pd.Series(["https://a.example/x/y/z?a=1&b=2#frag",
                   "http://a.example", "http://a.example/",
                   "not a url", None, "HTTPS://b.example/p?x",
                   "http://a.example//double//slash/"])
    f = url_features(s)
    assert list(f.path_depth) == [3, 0, 0, 0, 0, 1, 2]
    assert list(f.n_params) == [2, 0, 0, 0, 0, 1, 0]
    assert list(f.is_https) == [True, False, False, False, False, True,
                                False]
    assert f.path_len[0] == len("/x/y/z")
    assert f.path_len[2] == 1  # bare trailing slash


def test_url_features_bare_trailing_question_mark():
    """ADVICE r3: a bare trailing '?' (empty query) must count 0 params —
    ''.split('&') yields [''] so the count needs an explicit mask."""
    import pandas as pd

    from pdf_extract_ray.functions.url import url_features

    s = pd.Series(["http://a.example/p?", "http://a.example/p?&",
                   "http://a.example/p?a=1"])
    f = url_features(s)
    assert list(f.n_params) == [0, 2, 1]  # '?&' = two empty parts, kept as-is
    assert list(f.path_len) == [2, 2, 2]

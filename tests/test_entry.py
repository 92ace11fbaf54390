"""Driver-contract smoke: entry() runs on sf0.001 with a stable schema."""


def test_entry_smoke(ray_session):
    import __ray_entry__ as e

    ds = e.entry()
    rows = ds.take(5)
    assert len(rows) >= 1
    assert set(rows[0]) == {"url", "warc_ts", "lang", "extracted_text",
                            "n_sentences", "n_pages", "status"}
    assert ds.count() == 500


def test_oracle_keys_subset_of_queries():
    import __ray_entry__ as e

    q, o = e.queries(), e.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 30

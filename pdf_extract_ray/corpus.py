"""Deterministic synthetic Common-Crawl-style ``pages`` corpus.

Generates the ``input_hint`` table ``(url, warc_ts, html, text, lang)``
from a seed, with the page archetypes of FIXTURES.md F1: boilerplate
chrome, heading hierarchies with consecutive same-level headings,
dot-leader TOC lines, hard-wrapped sentences, multi-sentence lines,
bracket/whitespace noise, multi-page ``<section data-page>`` documents,
Zipf-hot hosts (skew), empty/invalid pages and exact-duplicate content.

Determinism is PER URL (randomness derived from ``sha256(seed, doc_id)``),
never from a shared RNG sequence, so generation is order-independent and
can run inside parallel ``map_batches`` tasks at any scale.  A corpus is
fully specified by ``(seed, n_docs)``.
"""

from __future__ import annotations

import hashlib
import random
from datetime import datetime, timedelta

import pyarrow as pa

EPOCH = datetime(2024, 1, 1)

_WORDS = (
    "asylum court decision appeal member state border protection status "
    "ruling judge application transfer minor family procedure detention "
    "return directive regulation article council european union law case "
    "hearing evidence claim country origin safe residence permit visa"
).split()

_KO_WORDS = (
    "난민 법원 판결 항소 회원국 국경 보호 지위 재판부 신청 이송 미성년자 "
    "가족 절차 구금 송환 지침 규정 조항 이사회 유럽연합 법률 사건 심리 "
    "증거 주장 출신국 안전 체류 허가 비자"
).split()


def _rng_for(seed: int, doc_id: int) -> random.Random:
    h = hashlib.sha256(f"{seed}:{doc_id}".encode()).digest()
    return random.Random(int.from_bytes(h[:8], "big"))


def _sentence(rng: random.Random, words: list[str], n: int, end: str = ".") -> str:
    toks = [rng.choice(words) for _ in range(n)]
    s = " ".join(toks)
    return s[0].upper() + s[1:] + end if s and s[0].isascii() else s + end


def _host(rng: random.Random, n_hosts: int) -> str:
    # Zipf-like: host k chosen with p ~ 1/(k+1); a few hosts are hot
    z = rng.paretovariate(1.1)
    k = min(n_hosts - 1, int(z) - 1)
    return f"host{k}.example"


def build_doc(seed: int, doc_id: int, n_hosts: int = 50) -> dict:
    """Build one deterministic page row."""
    rng = _rng_for(seed, doc_id)
    lang = "ko" if rng.random() < 0.3 else "en"
    words = _KO_WORDS if lang == "ko" else _WORDS
    host = _host(rng, n_hosts)
    url = f"https://{host}/doc{doc_id}/{lang}"
    warc_ts = EPOCH + timedelta(seconds=doc_id * 17)

    archetype = rng.random()
    if archetype < 0.02:
        # empty body
        return {"url": url, "warc_ts": warc_ts, "html": b"<html><body></body></html>",
                "text": None, "lang": lang}
    if archetype < 0.04:
        # invalid bytes (non-HTML) with a pre-extracted text fallback
        text = " ".join(_sentence(rng, words, rng.randint(4, 9)) for _ in range(3))
        return {"url": url, "warc_ts": warc_ts, "html": bytes([rng.randrange(256) for _ in range(64)]),
                "text": text, "lang": lang}
    if archetype < 0.06:
        # duplicate content under a distinct url (exact-dedup fixture):
        # regenerate another doc's page body deterministically
        twin = max(0, doc_id - 10)
        twin_row = build_doc(seed, twin, n_hosts) if twin != doc_id else None
        if twin_row is not None:
            return {"url": url, "warc_ts": warc_ts, "html": twin_row["html"],
                    "text": twin_row["text"], "lang": twin_row["lang"]}

    n_pages = rng.choice([1, 1, 1, 2, 3])
    parts = ["<html><head><title>t</title></head><body>",
             "<header>Site chrome header</header><nav><a href='/'>home</a> | <a href='/x'>nav</a></nav>"]
    plain_parts: list[str] = []
    for page in range(1, n_pages + 1):
        parts.append(f"<section data-page=\"{page}\">")
        n_sections = rng.randint(1, 3)
        for _ in range(n_sections):
            # heading block; sometimes consecutive same-level headings (merge fixture)
            h_level = rng.choice(["h1", "h2", "h3"])
            n_heads = rng.choice([1, 1, 1, 2])
            for _ in range(n_heads):
                head = _sentence(rng, words, rng.randint(2, 5), end="")
                parts.append(f"<{h_level}>{head}</{h_level}>")
                plain_parts.append(head)
            if rng.random() < 0.2:
                # dot-leader TOC line
                parts.append(f"<p>{_sentence(rng, words, 3, end='')} ........ {rng.randint(1, 99)}</p>")
            n_paras = rng.randint(1, 5)
            for _ in range(n_paras):
                n_sents = rng.randint(1, 3)
                sents = [_sentence(rng, words, rng.randint(5, 14)) for _ in range(n_sents)]
                para = " ".join(sents)
                plain_parts.append(para)
                style = rng.random()
                if style < 0.35:
                    # hard-wrapped mid-sentence across multiple <p> fragments
                    toks = para.split()
                    cut = rng.randint(2, max(3, len(toks) - 2))
                    parts.append(f"<p>{' '.join(toks[:cut])}</p>")
                    parts.append(f"<p>{' '.join(toks[cut:])}</p>")
                elif style < 0.45:
                    # bracket/whitespace noise
                    noisy = para.replace(" ", "  ", 3)
                    noisy = noisy.replace(".", f" ( {rng.choice(words)} ) .", 1)
                    parts.append(f"<p>{noisy}</p>")
                elif style < 0.5:
                    # bold paragraph (tagged H2 by the parser)
                    parts.append(f"<p><b>{para}</b></p>")
                else:
                    parts.append(f"<p>{para}</p>")
        parts.append("</section>")
    parts.append("<footer>copyright chrome footer</footer></body></html>")
    html = "".join(parts).encode("utf-8")
    text = " ".join(plain_parts) if rng.random() > 0.2 else None
    return {"url": url, "warc_ts": warc_ts, "html": html, "text": text, "lang": lang}


def pages_table(n_docs: int, seed: int = 42, n_hosts: int = 50,
                start: int = 0) -> pa.Table:
    """Materialize rows [start, start+n_docs) as one Arrow table."""
    rows = [build_doc(seed, i, n_hosts) for i in range(start, start + n_docs)]
    return pa.table(
        {
            "url": pa.array([r["url"] for r in rows], pa.string()),
            "warc_ts": pa.array([r["warc_ts"] for r in rows], pa.timestamp("us")),
            "html": pa.array([r["html"] for r in rows], pa.binary()),
            "text": pa.array([r["text"] for r in rows], pa.large_string()),
            "lang": pa.array([r["lang"] for r in rows], pa.string()),
        }
    )


def write_pages_corpus(out_dir: str, n_docs: int, seed: int = 42,
                       n_hosts: int = 50, docs_per_file: int = 2000) -> list[str]:
    """Write a sharded parquet corpus (one file per shard => resumable /
    partitionable reads).  Returns the file paths."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for start in range(0, n_docs, docs_per_file):
        n = min(docs_per_file, n_docs - start)
        path = os.path.join(out_dir, f"pages_{start:08d}.parquet")
        if not os.path.exists(path):
            tmp = path + ".tmp"
            pq.write_table(pages_table(n, seed, n_hosts, start), tmp)
            os.replace(tmp, path)
        paths.append(path)
    return paths


def pages_from_documents(documents: pa.Table, seed: int = 1234) -> pa.Table:
    """Derive a deterministic ``pages`` table from a driver ``documents``
    table (doc_id, text, lang, source, n_chars): each document's words are
    re-laid-out as an HTML page with headings/paragraphs/boilerplate chosen
    by a per-doc seeded RNG.  Lets the flagship extraction pipeline run over
    the read-only /root/testdata tables at any scale factor without
    external data."""
    doc_ids = documents["doc_id"].to_pylist()
    texts = documents["text"].to_pylist()
    langs = documents["lang"].to_pylist()
    sources = documents["source"].to_pylist()

    urls, tss, htmls, fallbacks = [], [], [], []
    for doc_id, text, lang, source in zip(doc_ids, texts, langs, sources):
        rng = _rng_for(seed, doc_id)
        words = (text or "").split()
        url = f"https://{source}.example/doc{doc_id}/{lang}"
        ts = EPOCH + timedelta(seconds=int(doc_id) * 31)
        if not words:
            urls.append(url); tss.append(ts)
            htmls.append(b"<html><body></body></html>"); fallbacks.append(None)
            continue
        parts = ["<html><body><header>chrome</header><nav>nav links</nav>"]
        n_pages = 1 + (doc_id % 3)
        i = 0
        page = 1
        parts.append(f'<section data-page="{page}">')
        while i < len(words):
            roll = rng.random()
            if roll < 0.15 and i + 3 <= len(words):
                h = rng.choice(["h1", "h2", "h3"])
                parts.append(f"<{h}>{' '.join(words[i:i+3])}</{h}>")
                i += 3
            else:
                n = min(rng.randint(5, 12), len(words) - i)
                chunk = " ".join(words[i : i + n]) + "."
                if rng.random() < 0.3 and n > 4:
                    cut = n // 2
                    parts.append(f"<p>{' '.join(words[i:i+cut])}</p>")
                    parts.append(f"<p>{' '.join(words[i+cut:i+n])}.</p>")
                else:
                    parts.append(f"<p>{chunk}</p>")
                i += n
            if rng.random() < 0.2 and page < n_pages:
                parts.append("</section>")
                page += 1
                parts.append(f'<section data-page="{page}">')
        parts.append("</section><footer>footer chrome</footer></body></html>")
        urls.append(url)
        tss.append(ts)
        htmls.append("".join(parts).encode())
        fallbacks.append(text)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(fallbacks, pa.large_string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


# word i of _WORDS is the pseudo-translation of word i of _KO_WORDS — lets
# the deterministic HashEmbedder (vocab_map=PSEUDO_TRANSLATIONS) see true
# parallel sentences as near-identical token bags (FIXTURES.md F6)
PSEUDO_TRANSLATIONS = {k: e for k, e in zip(_KO_WORDS, _WORDS)}
_NV = min(len(_WORDS), len(_KO_WORDS))


def paired_sentence_tables(n_docs: int, seed: int = 77) -> tuple[pa.Table, pa.Table]:
    """Deterministic KR/EN parallel sentence tables for alignment tests:
    (doc_key, sent_no, text, source_type).  Each doc pair shares structure;
    some EN sentences are dropped and extra unmatched ones inserted so the
    greedy matcher's unmatched paths are exercised."""
    kr_rows, en_rows = [], []
    for d in range(n_docs):
        rng = _rng_for(seed, 10_000 + d)
        doc_key = f"doc{d}"
        kr_no = en_no = 0

        def emit(kr_text, en_text, st, drop_en=False):
            nonlocal kr_no, en_no
            kr_rows.append((doc_key, kr_no, kr_text, st)); kr_no += 1
            if not drop_en:
                en_rows.append((doc_key, en_no, en_text, st)); en_no += 1

        # anchor header for pattern matching in ~half the docs
        if rng.random() < 0.5:
            emit("목차", "Table of contents", "H1")
        n_sections = rng.randint(2, 4)
        for s in range(n_sections):
            idxs = [rng.randrange(_NV) for _ in range(3)]
            emit(" ".join(_KO_WORDS[i] for i in idxs),
                 " ".join(_WORDS[i] for i in idxs),
                 rng.choice(["H1", "H2", "H3"]))
            n_ps = rng.randint(2, 5)
            for p in range(n_ps):
                idxs = [rng.randrange(_NV) for _ in range(rng.randint(5, 10))]
                drop = rng.random() < 0.1  # EN side missing -> unmatched KR
                emit(" ".join(_KO_WORDS[i] for i in idxs) + ".",
                     " ".join(_WORDS[i] for i in idxs) + ".",
                     "P", drop_en=drop)
            if rng.random() < 0.2:  # extra EN-only sentence -> unmatched EN
                idxs = [rng.randrange(_NV) for _ in range(6)]
                en_rows.append((doc_key, en_no,
                                " ".join(_WORDS[i] for i in idxs) + ".", "P"))
                en_no += 1

    def table(rows):
        return pa.table({
            "doc_key": pa.array([r[0] for r in rows], pa.string()),
            "sent_no": pa.array([r[1] for r in rows], pa.int64()),
            "text": pa.array([r[2] for r in rows], pa.large_string()),
            "source_type": pa.array([r[3] for r in rows], pa.string()),
        })

    return table(kr_rows), table(en_rows)


def pdfs_from_documents(documents: pa.Table) -> pa.Table:
    """Deterministic PDF corpus derived from the documents table: each doc
    rendered as a simple multi-page PDF (bold title + wrapped body lines)
    via sources/pdf.document_to_pdf; every other doc Flate-compressed.
    Shared by the ``pdf_extract_docs`` driver query and its single-process
    golden generator — no external data."""
    from pdf_extract_ray.sources.pdf import document_to_pdf

    ids = documents.column("doc_id").to_pylist()
    texts = documents.column("text").to_pylist()
    sources = (documents.column("source").to_pylist()
               if "source" in documents.column_names else [""] * len(ids))
    pdfs = [
        document_to_pdf(f"Document {i} ({s})", t or "", compress=i % 2 == 0)
        for i, t, s in zip(ids, texts, sources)
    ]
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "url": pa.array([f"pdf://doc/{i}" for i in ids], pa.string()),
        "pdf": pa.array(pdfs, pa.binary()),
    })


def nb_train_frame(doc_ids) -> "pd.DataFrame":
    """Deterministic labeled training set for the Naive-Bayes quality
    classifier, derived arithmetically from doc_ids: even ids become
    stopword-rich 'good' prose, odd ids become keyword-stuffed 'spam',
    each with two interpolated numbers so no two rows are constant.
    Shared by the ``nb_quality_docs`` driver query and its single-process
    golden generator — no external data."""
    import numpy as np
    import pandas as pd

    ids = pd.Series(doc_ids).astype("int64")
    yr = (1990 + ids % 30).astype(str)
    k = (ids % 7).astype(str)
    good = ("the report of year " + yr + " was written and it is clear "
            "that the results are good for " + k + " of the cases we saw")
    spam = ("buy cheap pills " + yr + " buy cheap pills casino bonus "
            "click here casino bonus " + k + " free free free win now")
    even = (ids % 2 == 0)
    return pd.DataFrame({
        "doc_id": ids.to_numpy(),
        "text": good.where(even, spam).to_numpy(),
        "label": np.where(even.to_numpy(), "good", "spam"),
    })


def nb_topic_frame(doc_ids) -> "pd.DataFrame":
    """Deterministic 3-class labeled set (news / code / shop prose,
    interpolated numbers) for the multiclass NB classifier — shared by
    the ``nb_topic_docs`` driver query and its golden generator."""
    import numpy as np
    import pandas as pd

    ids = pd.Series(doc_ids).astype("int64")
    yr = (1990 + ids % 30).astype(str)
    k = (ids % 7).astype(str)
    news = ("the minister said the report was published in " + yr
            + " and officials confirmed the decision after " + k
            + " meetings with the committee")
    code = ("def function " + k + " return value import module class "
            "object print error raise exception for loop in range " + yr)
    shop = ("buy now price " + yr + " discount free shipping cart "
            "checkout order sale save " + k + " percent today only")
    mod = (ids % 3).to_numpy()
    text = np.select([mod == 0, mod == 1], [news, code], default=shop)
    label = np.select([mod == 0, mod == 1], ["news", "code"],
                      default="shop")
    return pd.DataFrame({"doc_id": ids.to_numpy(), "text": text,
                         "label": label})


def synth_layout_rows(n_docs: int = 4) -> list[dict]:
    """Deterministic synthetic span-table rows for the layout-tagging path
    (M1-M5): two-column x/y geometry, mixed sizes/flags/colors.  Shared by
    the driver query and the single-process golden generator so both sides
    tag the exact same spans."""
    import random

    rows = []
    for seed in range(n_docs):
        rng = random.Random(seed)
        for page in range(1, 20):
            for i in range(rng.randint(3, 10)):
                rows.append({
                    "url": f"doc{seed}", "page_no": page,
                    "x0": rng.choice([50.0, 350.0]), "y0": 40.0 + i * 20,
                    "x1": 300.0, "y1": 52.0 + i * 20,
                    "text": f"line {page} {i}",
                    "size": rng.choice([10.0, 10.0, 12.0, 18.0]),
                    "flags": rng.choice([0, 0, 16]), "color": rng.choice([0, 3101846]),
                })
    return rows

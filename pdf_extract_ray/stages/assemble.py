"""Per-document reassembly: ordered sentences -> one extracted_text string.

Reference analogue: the implicit ordering contract of sentence_index /
document-sequential fragment ids (reference: main.py:1361,
pdf_to_json/main.py:96-106).  ``extracted_text`` is the byte-exact join of
the document's sentences in (page_no, sent_no) order — the north rule's
"byte-identical extracted text per url" invariant.
"""

from __future__ import annotations

from pdf_extract_ray.config import DEFAULT_CONFIG, ExtractConfig
from pdf_extract_ray.stages.splitter import Sentence


def assemble_sentences(sents: list[Sentence], cfg: ExtractConfig = DEFAULT_CONFIG) -> tuple[str, int, int]:
    """Returns (extracted_text, n_sentences, n_pages).

    Sentences are sorted by the explicit order key (sent_no is already
    document-sequential); never rely on arrival order across a shuffle.
    """
    ordered = sorted(sents, key=lambda s: s.sent_no)
    text = cfg.sentence_joiner.join(s.text for s in ordered)
    n_pages = len({s.page_no for s in ordered}) if ordered else 0
    return text, len(ordered), n_pages

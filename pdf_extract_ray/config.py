"""Extraction rule-pack configuration.

Mirrors the tunable constants of the reference's layout/config modules
(reference: euaa_사례/pdf_to_json/config.py:22-45, sentence_composer.py:354-404,
sentences/metadata_generator.py:510-543) as one frozen, serializable config
object.  A config hash travels in the checkpoint manifest's
``stage_versions`` so lineage records which rule pack produced a partition
(reference analogue: dynamic prompt packs, main.py:55-101).
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass, field


@dataclass(frozen=True)
class ExtractConfig:
    # --- layout analysis (PDF-style span tables; reference pdf_to_json/config.py) ---
    header_margin_ratio: float = 0.05   # top 5% of page height = header chrome
    footer_margin_ratio: float = 0.05   # bottom 5% = footer chrome
    h1_size_multiplier: float = 1.5     # H1 if size >= 1.5 * body size AND bold
    h3_colors: tuple[int, ...] = (3101846, 3036053, 352961, 353217)
    bold_flag: int = 16                 # PyMuPDF-style bold bit
    italic_flag: int = 2

    # --- HTML DOM analogue of the layout rules ---
    boilerplate_tags: tuple[str, ...] = (
        "header", "nav", "footer", "aside", "script", "style", "noscript",
        "template", "iframe", "svg", "form", "button",
    )
    heading_map: tuple[tuple[str, str], ...] = (
        ("h1", "H1"), ("h2", "H2"), ("h3", "H3"),
        ("h4", "H3"), ("h5", "H3"), ("h6", "H3"),
    )
    block_tags: tuple[str, ...] = (
        "p", "li", "td", "th", "blockquote", "pre", "dd", "dt", "caption",
        "figcaption", "summary",
    )
    # a <p> fully wrapped in <b>/<strong> is a bold paragraph -> H2
    bold_inline_tags: tuple[str, ...] = ("b", "strong")

    # --- fragment merge (reference pdf_to_json/main.py:18-74) ---
    dot_leader_min: int = 5             # runs of >= 5 dots are stripped

    # --- sentence composition (reference sentence_composer.py:354-404) ---
    terminal_punct: str = ".?!"
    open_brackets: str = "(["
    close_brackets: str = ")]"

    # --- reassembly ---
    sentence_joiner: str = "\n"         # extracted_text = joiner.join(sentences)

    def config_hash(self) -> str:
        """Stable hash of the rule pack, recorded in manifest lineage."""
        blob = json.dumps(asdict(self), sort_keys=True, default=list)
        return hashlib.sha256(blob.encode()).hexdigest()[:16]


DEFAULT_CONFIG = ExtractConfig()


# ---------------------------------------------------------------------------
# rule-pack registry (X1/X2 analogue): the reference selects a prompt/config
# module per corpus key (main.py:55-101, sentences/utils.py:12-60); here a
# corpus/domain key selects a frozen ExtractConfig, and the pack's hash is
# recorded in manifest lineage.
# ---------------------------------------------------------------------------

RULE_PACKS: dict[str, ExtractConfig] = {
    "default": DEFAULT_CONFIG,
    # wider chrome margins for report-like PDFs (reference config.py values
    # were tuned per corpus; packs freeze such variants)
    "report": ExtractConfig(header_margin_ratio=0.08, footer_margin_ratio=0.08),
    # aggressive boilerplate stripping for chrome-heavy web pages
    "webchrome": ExtractConfig(
        boilerplate_tags=(
            "header", "nav", "footer", "aside", "script", "style", "noscript",
            "template", "iframe", "svg", "form", "button", "figure", "menu",
        )
    ),
}


def get_rule_pack(key: str) -> ExtractConfig:
    """Select an extraction rule pack by corpus/domain key (X1 analogue).
    Unknown keys fall back to the default pack."""
    return RULE_PACKS.get(key, DEFAULT_CONFIG)

"""Differential testing against Python's stdlib html.parser.

For *well-formed* HTML (balanced tags, no optional-close/void/rawtext/svg
quirks), this engine's element tag preorder, attributes and text content must
agree with an independent parser. This mirrors the reference's external
conformance criterion (element tag-name preorder equality,
ref: tools/scripts.zig:1994-2062) with the only independent parser available
offline.
"""

from __future__ import annotations

import random
from html.parser import HTMLParser

import pytest

from html_parser_ray import parse_html
from html_parser_ray.html.tokenizer import KIND_ELEMENT, KIND_TEXT

SAFE_TAGS = ["div", "span", "section", "em", "b", "i", "u", "article", "strong"]
SAFE_WORDS = ["alpha", "beta", "gamma", "delta", "text", "content", "word"]


def gen_tree(rng: random.Random, depth: int = 0) -> str:
    """Random well-formed HTML fragment."""
    parts = []
    for _ in range(rng.randint(1, 4)):
        r = rng.random()
        if r < 0.4 or depth >= 4:
            parts.append(" ".join(rng.choice(SAFE_WORDS) for _ in range(rng.randint(1, 4))))
        else:
            tag = rng.choice(SAFE_TAGS)
            attrs = ""
            if rng.random() < 0.6:
                attrs = f" id='n{rng.randint(0, 999)}'"
            if rng.random() < 0.5:
                cls = " ".join(rng.choice(SAFE_WORDS) for _ in range(rng.randint(1, 2)))
                attrs += f' class="{cls}"'
            if rng.random() < 0.3:
                attrs += f" data-k={rng.randint(0, 99)}"
            parts.append(f"<{tag}{attrs}>{gen_tree(rng, depth + 1)}</{tag}>")
    return "".join(parts)


class Collector(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.tags: list[str] = []
        self.attrs: list[dict] = []
        self.texts: list[str] = []

    def handle_starttag(self, tag, attrs):
        self.tags.append(tag)
        self.attrs.append({k: (v if v is not None else "") for k, v in attrs})

    def handle_data(self, data):
        if data:
            self.texts.append(data)


def engine_view(html: str):
    doc = parse_html(html)
    tags, attrs, texts = [], [], []
    for i in range(1, len(doc.kind)):
        if doc.kind[i] == KIND_ELEMENT:
            tags.append(doc.name[i].decode())
            attrs.append(
                {k.decode(): v.decode() for k, v in doc.attrs(i).items()}
            )
        elif doc.kind[i] == KIND_TEXT:
            texts.append(
                doc.source[doc.name_start[i] : doc.name_end[i]].decode()
            )
    return tags, attrs, texts


@pytest.mark.parametrize("seed", range(60))
def test_differential_wellformed(seed):
    rng = random.Random(seed * 7919)
    html = gen_tree(rng)
    ref = Collector()
    ref.feed(html)
    ref.close()
    tags, attrs, texts = engine_view(html)
    assert tags == ref.tags, html
    assert attrs == ref.attrs, html
    assert texts == ref.texts, html


def test_differential_with_entities():
    html = "<div id='x'>a &amp; b &lt;c&gt;</div>"
    ref = Collector()
    ref.feed(html)
    ref.close()
    doc = parse_html(html)
    # stdlib convert_charrefs decodes; our engine decodes at inner_text time
    assert doc.inner_text(doc.query_one("#x"), normalize=False) == "".join(ref.texts)

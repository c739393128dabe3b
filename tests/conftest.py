"""Shared fixtures. Ray is initialised ONCE per pytest session."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
        )
    yield
    ray.shutdown()


# The canonical selector fixture (ref: src/html/document.zig:892-905)
SELECTOR_FIXTURE_HTML = (
    "<html><body><div id='root'>"
    "<ul id='list'>"
    "<li id='li1' class='item a' data-k='v' data-prefix='prelude' "
    "data-suffix='trail-end' data-sub='in-middle' data-words='alpha beta gamma' "
    "lang='en-US'><span id='name1' class='name'>one</span></li>"
    "<li id='li2' class='item b' data-k='v2' data-prefix='presto' "
    "data-suffix='mid-end' data-sub='middle' data-words='beta delta' "
    "lang='en'><span id='name2' class='name'>two</span></li>"
    "<li id='li3' class='item c skip' data-k='x' data-prefix='nop' "
    "data-suffix='tail' data-sub='zzz' data-words='omega' "
    "lang='fr'><span id='name3' class='name'>three</span></li>"
    "</ul>"
    "<div id='sibs'>"
    "<a id='a1' class='link'></a>"
    "<a id='a2' class='link hot'></a>"
    "<span id='after_a2' class='marker'></span>"
    "<a id='a3' class='link'></a>"
    "</div>"
    "</div></body></html>"
)


@pytest.fixture(scope="session")
def fixture_doc():
    from html_parser_ray import parse_html

    return parse_html(SELECTOR_FIXTURE_HTML)


def ids_of(doc, indexes):
    return [
        (doc.get_attr(i, b"id") or b"").decode() for i in indexes
    ]

"""html_parser_ray — a Ray-Data-native HTML extraction and data-processing engine.

A from-scratch reimplementation of the capabilities of the reference
``SmallThingz/html_parser`` (a single-node Zig library) as an idiomatic Ray Data
pipeline: permissive HTML tokenizer + index-array DOM
(ref: src/html/parser.zig, src/html/document.zig:56-73), CSS selector engine
(ref: src/selector/runtime.zig, src/selector/matcher.zig), lazy entity decode and
whitespace normalization (ref: src/html/entities.zig, src/html/node.zig:203-260),
plus the scale-out layers the reference does not have: boilerplate-strip
extraction over interleaved text+media documents, dedup / similarity / text
analysis pipelines, skew-aware splitting, checkpointed resumable output.

The engine is *output-equivalent, not mechanism-equivalent*: the reference
mutates its input buffer in place for speed; this engine treats input bytes as
immutable (Arrow buffers) and materializes decoded output, matching the
reference's own non-destructive path (ref: src/html/node.zig:135-171,
innerTextOwned) which its tests pin as equivalent to the in-place path.
"""

__version__ = "0.1.0"

from html_parser_ray.html.document import Document, parse_html
from html_parser_ray.selector.compiler import InvalidSelectorError, compile_selector

__all__ = [
    "Document",
    "parse_html",
    "compile_selector",
    "InvalidSelectorError",
]

"""htmlcore — the pure-Python single-document kernel (no Ray imports).

Public surface mirrors the reference's exports (reference:
src/public/index.ts / mod.ts): parse APIs, extraction, traversal,
serialization, chunking, patching, tokenization, streaming.
"""

from .api import (  # noqa: F401
    Budgets, BudgetExceededError, ParseError, ParseTree,
    WHATWG_PARSE_ERRORS_SECTION_URL, get_parse_error_spec_ref,
    normalize_parse_error_id, parse, parse_bytes, parse_fragment,
)
from .extract import (  # noqa: F401
    VisibleTextOptions, chunk, find_all_by_attr, find_all_by_tag_name,
    find_by_id, outline, serialize, serialize_node, text_content,
    visible_text, visible_text_tokens, visible_text_tokens_with_provenance,
    walk, walk_elements,
)
from .patch import (  # noqa: F401
    PatchPlanningError, apply_patch_plan, compute_patch,
)
from .sniff import (  # noqa: F401
    SniffResult, decode_html_bytes, sniff_html_encoding,
)
from .stream import (  # noqa: F401
    decode_stream_to_text, parse_stream, tokenize_stream,
)
from .tokens import tokenize  # noqa: F401
from .fixture_serializer import serialize_fixture_token_stream  # noqa: F401
from .normalize import normalize_tree  # noqa: F401

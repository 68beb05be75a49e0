"""Pure, Spark-free stage functions (the operator library).

Mirrors the reference's separation of ``ppocr/`` (operators) from
``tools/`` (drivers): every function here is ``bytes/str/ndarray in →
plain data out`` and is unit-testable without a SparkSession.
"""

from webextract.functions.htmlnorm import decode_html  # noqa: F401
from webextract.functions.tokenizer import tokenize_blocks  # noqa: F401
from webextract.functions.scorer import score_blocks  # noqa: F401
from webextract.functions.merger import merge_spans  # noqa: F401
from webextract.functions.extract import extract_page  # noqa: F401

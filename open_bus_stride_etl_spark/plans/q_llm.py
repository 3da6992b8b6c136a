"""M4 LLM-data-pipeline queries: dedup, similarity search, text analysis
over the ``documents`` and ``embeddings`` tables (BASELINE.json north-star
extensions). Filled in milestone M4.
"""

from __future__ import annotations

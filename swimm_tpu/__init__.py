"""swimm_tpu — TPU-native Smith-Waterman protein database search.

A brand-new TPU-native engine with the capabilities of the reference
``enzorucci/SWIMM`` (see SURVEY.md for the full structural analysis of the
reference; the reference mount was empty this round, so parity targets are
cited as SURVEY.md sections rather than file:line).

Layer map (SURVEY.md section 2, "new TPU framework" column):

  L5  CLI                  swimm_tpu.cli           (swtpu preprocess / search)
  L4  Pipeline             swimm_tpu.models.engine (db build + search driver)
  L3  Distribution         swimm_tpu.parallel      (mesh, sharded search, top-k merge)
  L2  Kernels              swimm_tpu.ops           (Pallas DP kernel + lax.scan path)
  L1  Data                 swimm_tpu.alphabet/.matrices/.fasta/.db
  L0  Results              swimm_tpu.models.results, swimm_tpu.utils.metrics
"""

__version__ = "0.1.0"

from swimm_tpu.alphabet import encode, decode, ALPHABET, PAD_CODE
from swimm_tpu.matrices import get_matrix, available_matrices


def __getattr__(name):
    # Lazy re-exports of the main user-facing API (keeps `import swimm_tpu`
    # light: jax only loads when the engine is touched).
    engine_api = {"SearchConfig", "search", "search_fused", "Hit",
                  "QueryResult", "score_db", "score_db_streaming",
                  "top_k_hits"}
    if name in engine_api:
        from swimm_tpu.models import engine
        return getattr(engine, name)
    if name in {"build_db", "load_db", "PackedDb"}:
        from swimm_tpu import db
        return getattr(db, name)
    if name in {"read_fasta", "write_fasta", "iter_fasta", "FastaRecord"}:
        from swimm_tpu import fasta
        return getattr(fasta, name)
    if name == "sharded_search":
        from swimm_tpu.parallel.sharded_search import sharded_search
        return sharded_search
    if name in {"EValueModel", "fit_evalue_model", "fit_evalue_model_hist"}:
        from swimm_tpu.utils import stats
        return getattr(stats, name)
    if name in {"SearchServer", "serve_stdio", "serve_socket"}:
        from swimm_tpu import server
        return getattr(server, name)
    if name == "request":     # jax-free client for a serve --listen server
        from swimm_tpu.client import request
        return request
    raise AttributeError(f"module 'swimm_tpu' has no attribute {name!r}")

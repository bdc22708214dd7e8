import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="session")
def spark():
    from paperslicer_spark.session import get_spark

    s = get_spark(app_name="paperslicer-tests", master="local[4]",
                  shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def reference_modules():
    """Reference extractor modules, made importable via the lxml shim.

    Used as an *executable oracle*: tests compare engine output against
    the reference's own code running on identical inputs.
    """
    import lxml_shim

    lxml_shim.install()
    sys.path.insert(0, "/root/reference")
    from paperslicer.grobid import parser as ref_parser
    from paperslicer.utils import sections_mapping as ref_mapping
    from paperslicer.journals import review as ref_review

    return ref_parser, ref_mapping, ref_review


@pytest.fixture(scope="session")
def corpus_path(tmp_path_factory):
    """Small deterministic transcript corpus parquet."""
    from paperslicer_spark.sources.transcripts import write_local_corpus

    d = tmp_path_factory.mktemp("corpus") / "transcripts"
    d.mkdir()
    write_local_corpus(str(d / "part-0.parquet"), n_docs=40, seed=42,
                       skew_every=13, skew_mult=8)
    return str(d)

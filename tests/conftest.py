from __future__ import annotations

import shutil

import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(
        address="local", num_cpus=4, include_dashboard=False, ignore_reinit_error=True
    )
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def ray_entry_mod():
    """The repo-root ``__ray_entry__`` module, loaded once per session
    from a path relative to this file (no hardcoded checkout location)."""
    import importlib.util
    import sys
    from pathlib import Path

    path = Path(__file__).resolve().parents[1] / "__ray_entry__.py"
    spec = importlib.util.spec_from_file_location("__ray_entry__", str(path))
    mod = importlib.util.module_from_spec(spec)
    sys.modules.setdefault("__ray_entry__", mod)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="session")
def small_corpus_dir(tmp_path_factory):
    """Deterministic 300-row synthetic corpus, 3 files."""
    from indri_5_5_ray.sources.corpus import write_synthetic_corpus

    d = tmp_path_factory.mktemp("corpus")
    write_synthetic_corpus(str(d), 300, seed=42, rows_per_file=100)
    return str(d)


@pytest.fixture(scope="session")
def built_index(small_corpus_dir, tmp_path_factory):
    """One shared index build (positions on, dedup by sha256, kstem)."""
    from indri_5_5_ray.config import IndexConfig
    from indri_5_5_ray.pipelines.build import build_index

    out = str(tmp_path_factory.mktemp("index") / "idx")
    cfg = IndexConfig(max_chunk_docs=64, n_buckets=4, dedup_key="sha256")
    manifest = build_index(small_corpus_dir, out, cfg, resume=False)
    return out, manifest

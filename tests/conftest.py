import os

import pytest

REFERENCE_CACHE_DIR = os.environ.get("LMDX_REFERENCE_CACHE_DIR", "/root/reference/cache")


def reference_cache_path(name: str) -> str:
    return os.path.join(REFERENCE_CACHE_DIR, name)


@pytest.fixture
def ref_cache_gpt4():
    path = reference_cache_path("cache_lmd_v0.1_gpt-4.json")
    if not os.path.exists(path):
        pytest.skip("reference layout cache fixtures not available")
    return path


@pytest.fixture
def ref_cache_gpt35():
    path = reference_cache_path("cache_lmd_v0.1_gpt-3.5-turbo.json")
    if not os.path.exists(path):
        pytest.skip("reference layout cache fixtures not available")
    return path

import json

import pytest

from lmdx.text.cache import LayoutCache, cache_filename


def test_sequential_read_and_write_through(tmp_path):
    path = tmp_path / "cache.json"
    cache = LayoutCache(str(path))
    assert cache.get("p") is None
    cache.add("p", "r1")
    cache.add("p", "r2")

    # Fresh instance: sequential reads replay responses in insertion order.
    cache2 = LayoutCache(str(path))
    assert cache2.get("p") == "r1"
    assert cache2.get("p") == "r2"
    assert cache2.get("p") is None  # exhausted -> miss (does not count as access)
    assert cache2.values_accessed() == 2

    cache2.reset_access()
    assert cache2.get("p") == "r1"


def test_file_format_matches_reference(tmp_path):
    path = tmp_path / "cache.json"
    cache = LayoutCache(str(path))
    cache.add("prompt a", "resp a")
    data = json.load(open(path))
    assert data == {"prompt a": ["resp a"]}


def test_allow_nonexist(tmp_path):
    with pytest.raises(FileNotFoundError):
        LayoutCache(str(tmp_path / "missing.json"), allow_nonexist=False)


def test_cache_filename_convention():
    assert cache_filename("lmd", "v0.1", "gpt-4") == "cache/cache_lmd_v0.1_gpt-4.json"
    assert (
        cache_filename("lmd_negation", "v0.1", "gpt-3.5-turbo")
        == "cache/cache_negation_v0.1_gpt-3.5-turbo.json"
    )

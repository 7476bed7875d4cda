"""Process-level runtime helpers (core/runtime.py): compile-cache scoping.

The persistent .jax_cache outlives the container host, so CPU AOT entries
must be host-local (ISA-feature fingerprinted) while legacy root entries
migrate into the backend subdir without losing the warm cache."""

import os

from multimodal_rssm_tpu.core.runtime import _cpu_host_tag, enable_persistent_cache


def test_cpu_host_tag_stable_and_machine_scoped():
    t1, t2 = _cpu_host_tag(), _cpu_host_tag()
    assert t1 == t2
    assert t1  # non-empty
    # x86_64 hosts must include the ISA-feature hash, not just the arch
    if os.path.exists("/proc/cpuinfo"):
        assert "-" in t1


def _with_restored_cache_config(fn):
    """Restore BOTH globals enable_persistent_cache touches, so the rest of
    the suite keeps conftest's cache dir and 0.5 s persistence threshold."""
    import jax

    prev_dir = jax.config.jax_compilation_cache_dir
    prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    try:
        return fn()
    finally:
        jax.config.update("jax_compilation_cache_dir", prev_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          prev_min)


def test_cache_dir_scoped_by_backend(tmp_path):
    def run():
        # conftest pins the cpu platform, so the scoped dir is cpu-<tag>
        d = enable_persistent_cache(root=str(tmp_path))
        assert d == str(tmp_path / f"cpu-{_cpu_host_tag()}")

        import jax

        assert jax.config.jax_compilation_cache_dir == d

    _with_restored_cache_config(run)


def test_legacy_root_entries_not_served_to_cpu(tmp_path):
    """Pre-scoping entries at the cache root (written by an arbitrary old
    host) must not land in the host-scoped CPU dir."""
    def run():
        legacy = tmp_path / "jit_f-deadbeef-cache"
        legacy.write_bytes(b"stale")
        d = enable_persistent_cache(root=str(tmp_path))
        assert legacy.exists()  # untouched: only TPU backends migrate
        assert not os.path.exists(os.path.join(d, legacy.name))

    _with_restored_cache_config(run)

import jax


def test_backend_is_cpu_with_8_devices(eight_devices):
    assert jax.default_backend() == "cpu"
    assert len(eight_devices) == 8

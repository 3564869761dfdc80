# Top-level convenience targets

.PHONY: test bench native dryrun counts clean

native:
	$(MAKE) -C native

test: native
	python -m pytest tests/ -q

bench: native
	python bench.py

dryrun:
	JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	python -c "import jax; jax.config.update('jax_platforms','cpu'); \
	import __graft_entry__ as g; g.dryrun_multichip(8)"

counts:
	python tools/update_counts.py

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} +

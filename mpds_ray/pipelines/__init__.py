"""Ray Data pipelines: flagship tokens engine + query library."""

"""End-to-end Dataset pipelines and checkpoint manifests."""

"""Cross-cutting utilities: GMM math, metrics, meters, flow IO, visualization."""

"""Offline tools: GMM penalty fitting (EM), etc."""

"""Embedding similarity queries — populated in later milestones."""

"""Text-analysis queries — populated in later milestones."""

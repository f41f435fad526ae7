"""Domain-kernel queries — populated in later milestones."""

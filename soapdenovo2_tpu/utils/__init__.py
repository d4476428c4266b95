"""Utilities: genome/read simulation, assembly statistics, logging."""

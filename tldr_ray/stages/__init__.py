"""Stateless / actor-pool Ray Data batch stages."""

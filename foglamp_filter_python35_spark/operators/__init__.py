"""Catalyst-native operators reproducing the reference filter surface."""

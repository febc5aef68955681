"""Pipeline stages (L3): preprocess -> collect -> assemble -> pick -> patch."""

"""Column-generation operators: pure Catalyst expression builders."""

from .rules import Rule, RuleSet, load_rules_toml

__all__ = ["Rule", "RuleSet", "load_rules_toml"]

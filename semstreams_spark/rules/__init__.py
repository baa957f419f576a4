from .engine import Rule, Condition, evaluate_rules, DEFAULT_RULES

__all__ = ["Rule", "Condition", "evaluate_rules", "DEFAULT_RULES"]

from .python_expr import python_expr_column

__all__ = ["python_expr_column"]

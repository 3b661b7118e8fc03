# Operator modules self-register into ..registry via the @query decorator.

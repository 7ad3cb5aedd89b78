"""Regression with TabPFNRegressor (cf. reference
`models/mmpfn/examples/tabpfn_for_regression.py`)."""

from sklearn.datasets import load_diabetes
from sklearn.metrics import mean_squared_error, r2_score
from sklearn.model_selection import train_test_split

from multimodalpfn_tpu import TabPFNRegressor

X, y = load_diabetes(return_X_y=True)
X_train, X_test, y_train, y_test = train_test_split(X, y, test_size=0.33, random_state=42)

reg = TabPFNRegressor(model_path="auto")
reg.fit(X_train, y_train)
pred = reg.predict(X_test)
print("MSE:", mean_squared_error(y_test, pred))
print("R2:", r2_score(y_test, pred))

full = reg.predict(X_test, output_type="main")
print("median head:", full["median"][:5])

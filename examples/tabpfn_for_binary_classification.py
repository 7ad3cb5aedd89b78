"""Binary classification with TabPFNClassifier (cf. reference
`models/mmpfn/examples/tabpfn_for_binary_classification.py`)."""

from sklearn.datasets import load_breast_cancer
from sklearn.metrics import accuracy_score, roc_auc_score
from sklearn.model_selection import train_test_split

from multimodalpfn_tpu import TabPFNClassifier

X, y = load_breast_cancer(return_X_y=True)
X_train, X_test, y_train, y_test = train_test_split(X, y, test_size=0.33, random_state=42)

clf = TabPFNClassifier(model_path="auto")
clf.fit(X_train, y_train)
print("ROC AUC:", roc_auc_score(y_test, clf.predict_proba(X_test)[:, 1]))
print("Accuracy:", accuracy_score(y_test, clf.predict(X_test)))

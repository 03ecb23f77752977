CREATE GRAPH <urn:gnew>

import { readFile } from "fs";

export function parseThing(x: string): number {
  const y = x.length;
  return y;
}

class Widget {
  render() {
    return "<div/>";
  }
}
